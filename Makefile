# Top-level driver (parity with the reference's Makefile targets).

PYTHON ?= python

all: native test

test: python-test native-test

# Default tier skips slow-marked (compile-heavy) tests via pytest.ini
# addopts; the full suite's first cold run on a 2-core box is dominated by
# XLA:CPU compiles of the big limb-arithmetic graphs (cached across runs
# in .jax_cache_cpu).
python-test:
	$(PYTHON) -m pytest tests/ -x -q

python-test-slow:
	$(PYTHON) -m pytest tests/ -x -q -m "slow"

python-test-all:
	$(PYTHON) -m pytest tests/ -x -q -m ""

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

.PHONY: all test python-test python-test-slow python-test-all native \
	native-test bench bench-workloads artifacts clean
