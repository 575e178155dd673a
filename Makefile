# Developer entry points (the reference ships the same make targets).

PYTHON ?= python

.PHONY: all native test test-fast test-slow coverage bench package image clean

all: native

native:
	$(MAKE) -C watsor_tpu/native

test: native
	$(PYTHON) -m pytest tests/ -x -q

# the sub-5-minute single-core loop: everything not marked `slow`
# (slow = big CPU compiles, soaks, multi-minute app rigs)
test-fast: native
	$(PYTHON) -m pytest tests/ -x -q -m "not slow"

# the full slow tier, chunked one-file-per-process with per-chunk timeouts
# so it completes on a one-core host (see scripts/test_slow.sh)
test-slow: native
	bash scripts/test_slow.sh

coverage: native
	$(PYTHON) -m pytest tests/ -q --cov=watsor_tpu --cov-report=term-missing \
	  || $(PYTHON) -m pytest tests/ -q

bench: native
	$(PYTHON) bench.py

package:
	$(PYTHON) -m pip wheel --no-deps -w build/dist .

image:
	docker build --tag watsor-tpu:latest --file docker/Dockerfile .
	docker build --tag watsor-tpu:cpu    --file docker/Dockerfile.cpu .

clean:
	$(MAKE) -C watsor_tpu/native clean
	rm -rf .pytest_cache .jit_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
