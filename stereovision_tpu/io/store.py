"""Versioned calibration store + reference-pkl interchange.

The reference persists calibration as pickle files with fixed dict schemas
(SURVEY §2.9: ``calibration_data_{left,right}.pkl`` written at
camera_calibration.py:101-111 and ``stereo_calibration_data.pkl`` written at
stereo_calibration.py:276-302). This store keeps the same field names in a
versioned ``.npz`` (array-native, no pickle execution on load) and can
import/export the reference's pkl files byte-compatibly for A/B comparison.

Units: the reference's chessboard square size is centimeters (2camers.py:23),
so T and the baseline are cm; the store records ``length_unit`` explicitly —
the unit hygiene fix called out in SURVEY §7.3.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

MONO_KEYS = (
    "camera_matrix",
    "distortion_coefficients",
    "rotation_vectors",
    "translation_vectors",
    "reprojection_error",
)
STEREO_KEYS = (
    "ret", "R", "T", "E", "F", "R1", "R2", "P1", "P2", "Q", "roi1", "roi2",
    "mtx_left", "dist_left", "mtx_right", "dist_right",
    "chessboard_size", "square_size", "img_size", "num_valid_pairs",
)


class CalibrationStore:
    """Directory-backed store: ``<root>/<name>.npz`` with schema versioning."""

    VERSION = 1

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # -- generic ------------------------------------------------------------
    def save(self, name: str, data: dict, length_unit: str = "cm") -> Path:
        path = self.root / f"{name}.npz"
        payload = {k: np.asarray(v) for k, v in data.items() if v is not None}
        payload["_version"] = np.asarray(self.VERSION)
        payload["_length_unit"] = np.asarray(length_unit)
        np.savez(path, **payload)
        return path

    def load(self, name: str) -> dict:
        path = self.root / f"{name}.npz"
        with np.load(path, allow_pickle=False) as z:
            out = {k: z[k] for k in z.files}
        version = int(out.pop("_version", 1))
        if version > self.VERSION:
            raise ValueError(f"calibration {name} written by newer schema v{version}")
        out["_length_unit"] = str(out.get("_length_unit", "cm"))
        return out

    def exists(self, name: str) -> bool:
        return (self.root / f"{name}.npz").exists()

    # -- reference pkl interchange ------------------------------------------
    @staticmethod
    def load_reference_pkl(path: str | Path) -> dict:
        """Read a reference pickle (mono or stereo schema)."""
        with open(path, "rb") as f:
            return pickle.load(f)

    @staticmethod
    def save_reference_pkl(path: str | Path, data: dict) -> None:
        """Write the reference's pkl format (keys filtered to its schema)."""
        keys = STEREO_KEYS if "mtx_left" in data or "R" in data else MONO_KEYS
        out = {k: data[k] for k in keys if k in data}
        extra = {k: v for k, v in data.items() if k.startswith("calibration_type")}
        out.update(extra)
        with open(path, "wb") as f:
            pickle.dump(out, f)

    def export_txt_sidecars(self, name: str, out_dir: str | Path | None = None):
        """The reference's txt matrix dumps (stereo_calibration.py:305-309)."""
        data = self.load(name)
        out_dir = Path(out_dir) if out_dir else self.root
        mapping = {
            "rotation_matrix.txt": "R",
            "translation_vector.txt": "T",
            "essential_matrix.txt": "E",
            "fundamental_matrix.txt": "F",
            "Q_matrix.txt": "Q",
            "camera_matrix.txt": "camera_matrix",
            "distortion_coefficients.txt": "distortion_coefficients",
        }
        written = []
        for fname, key in mapping.items():
            if key in data:
                np.savetxt(out_dir / fname, np.atleast_2d(np.asarray(data[key], np.float64)))
                written.append(out_dir / fname)
        return written
