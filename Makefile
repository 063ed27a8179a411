# Top-level driver (parity with the reference's Makefile targets).

PYTHON ?= python

all: native test

test: python-test native-test

python-test:
	$(PYTHON) -m pytest tests/ -x -q

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

.PHONY: all test python-test native native-test bench bench-workloads artifacts clean
