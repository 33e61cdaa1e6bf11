# Developer entry points
.PHONY: test bench native dryrun clean

test:
	python -m pytest tests/ -x -q

bench:
	PYTHONPATH=$(CURDIR):$$PYTHONPATH python bench.py

native:
	$(MAKE) -C native

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	PYTHONPATH=$(CURDIR) python __graft_entry__.py

clean:
	rm -rf .jax_cache .jax_cache_tests
	$(MAKE) -C native clean
