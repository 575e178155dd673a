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

# line coverage via the in-tree sys.monitoring tool (scripts/pycov.py) —
# this rig has no coverage.py/pytest-cov and installs are off-limits.
# Fast tier only (the slow tier runs one-file-per-process; see
# scripts/test_slow.sh). Writes COVERAGE.json.
coverage: native
	$(PYTHON) -m pytest tests/ -q -m "not slow" -p scripts.pycov

# fast tier + the chunked slow tier, hits unioned across all processes
# (PYTEST_ADDOPTS injects the plugin into scripts/test_slow.sh's chunks)
coverage-all: native
	mkdir -p build && rm -f build/pycov_hits.jsonl
	PYCOV_DATA=$(CURDIR)/build/pycov_hits.jsonl \
	  $(PYTHON) -m pytest tests/ -q -m "not slow" -p scripts.pycov
	PYCOV_DATA=$(CURDIR)/build/pycov_hits.jsonl \
	  PYTEST_ADDOPTS="-p scripts.pycov" bash scripts/test_slow.sh
	$(PYTHON) scripts/pycov.py merge build/pycov_hits.jsonl

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
