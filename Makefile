# calm-tpu build entry points.
#   make native      -> build the C++ host runtime (container parser,
#                       tokenizer, sampler) into calm_tpu/_native/
#   make test        -> python test suite (virtual 8-device CPU mesh)
#   make fuzz-smoke  -> ASan mutation fuzz of the container parser
#   make bench       -> single-chip decode benchmark (real TPU)
.PHONY: all native test fuzz-smoke bench clean

all: native

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -x -q

fuzz-smoke:
	$(MAKE) -C native fuzz-smoke

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
