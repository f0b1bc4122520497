"""Model parameter persistence (flax serialization, no pickle execution)."""

from __future__ import annotations

from pathlib import Path

from flax import serialization


def save_variables(path: str | Path, variables) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(variables))
    return path


def load_variables(path: str | Path, template):
    """Restore variables into the structure of ``template`` (e.g. the output
    of ``mono.nn.create_model``'s init)."""
    return serialization.from_bytes(template, Path(path).read_bytes())
