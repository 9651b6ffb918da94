# Dev entry points. CPU test runs disable the axon TPU plugin registration
# (PALLAS_AXON_POOL_IPS= ) so interpreter startup doesn't claim a TPU grant.

CPU_ENV := PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

.PHONY: test test-fast bench native clean

test:
	$(CPU_ENV) python -m pytest tests/ -q

test-fast:
	$(CPU_ENV) python -m pytest tests/ -q -x -m "not slow"

bench:
	python bench.py

native:
	$(MAKE) -C opencl_path_tracer_tpu/native

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; true
