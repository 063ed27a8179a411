# Top-level driver (parity with the reference's Makefile targets).

PYTHON ?= python

all: native test

test: python-test native-test

# Test tiers (cold budgets on a 2-core box with no compile cache):
#   python-test         host tier: no XLA compiles at all - < 5 min cold.
#                       This is the CI default and works on any machine.
#   python-test-device  device tier: jit-compiling kernel/prover tests;
#                       ~20-40 min cold on 2 CPU cores, minutes warm
#                       (.jax_cache_cpu persists executables per machine).
#   python-test-slow    slow-marked subset of the device tier (large-shape
#                       envelopes, sharded prover) - heaviest compiles.
#   python-test-all     everything.
python-test:
	$(PYTHON) -m pytest tests/ -x -q

python-test-device:
	$(PYTHON) -m pytest tests/ -x -q -m "device and not slow"

python-test-slow:
	$(PYTHON) -m pytest tests/ -x -q -m "slow"

python-test-all:
	$(PYTHON) -m pytest tests/ -x -q -m ""

# Nightly/pre-release cadence: the device+slow tiers exercise the exact
# regression classes (254-bit envelopes, sharded prover, merged-tail) the
# default host tier cannot - run this on a schedule, not per-commit.
# Static analysis (reference Makefile:137-156 wires pyflakes/pylint/
# solhint; none ship in this image, so tools/lint.py implements the
# equivalent checks with stdlib ast/tokenize - exits 1 on any finding).
lint:
	$(PYTHON) tools/lint.py

ci-nightly: lint python-test python-test-device python-test-slow native-test

native:
	$(MAKE) -C native

native-test: native
	cd native && g++ -O2 -std=c++17 -o build/selftest test/selftest.cpp src/final_exp.cpp && ./build/selftest

bench:
	$(PYTHON) bench.py

bench-workloads:
	$(PYTHON) benchmarks/bench_workloads.py

# Regenerate the checked-in unrolled MiMC Solidity sources.
contracts/MiMCpe7_generated.sol:
	$(PYTHON) -m ethsnarks_tpu.mimc.contract_sol 7 > $@

contracts/MiMCpe5_generated.sol:
	$(PYTHON) -m ethsnarks_tpu.mimc.contract_sol 5 110 > $@

artifacts: contracts/MiMCpe7_generated.sol contracts/MiMCpe5_generated.sol

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache

.PHONY: all test lint python-test python-test-device python-test-slow \
	python-test-all ci-nightly native native-test bench bench-workloads \
	artifacts clean
