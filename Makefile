# calm-tpu build entry points.
#   make native      -> build the C++ host runtime (container parser,
#                       tokenizer, sampler) into calm_tpu/_native/
#   make test        -> python test suite (virtual 8-device CPU mesh)
#   make fuzz-smoke  -> ASan mutation fuzz of the container parser
#   make bench       -> single-chip decode benchmark (real TPU)
#   make tpu-smoke   -> on-TPU kernel lowering + fast-vs-reference parity
#                       gate (catches Mosaic-only regressions the CPU
#                       interpret-mode suite cannot see)
.PHONY: all native test test-quick fuzz-smoke bench tpu-smoke clean

all: native

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -x -q

test-quick:  # ~3 min inner-loop lane (full suite stays the merge gate)
	python -m pytest tests/ -x -q -m quick

fuzz-smoke:
	$(MAKE) -C native fuzz-smoke

bench:
	python bench.py

tpu-smoke:
	python tools/tpu_smoke.py

clean:
	$(MAKE) -C native clean
