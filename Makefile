.PHONY: all lib test bench clean ci

all: lib

# build the native fastx codec extension in-place
lib:
	python setup.py build_ext --inplace

# Two pytest shards: XLA:CPU leaks ~3 anonymous JIT code mappings per
# compiled executable and never unmaps them, so one process running the
# whole suite crosses default vm.max_map_count (65530) near the end and
# SEGFAULTS inside XLA's next compile (diagnosed 2026-08-19: maps
# sampled at 65033 just before the crash; ~21k r-x/r--/rw triplets at
# death).  Sharding keeps each process at ~half the mappings; raising
# the knob (sysctl -w vm.max_map_count=1048576) also works per host.
test:
	python -m pytest tests/test_[a-m]*.py -q
	python -m pytest tests/test_[n-z]*.py -q

bench:
	python bench.py

# the CI contract (mirrors the reference's .github/workflows/test.yml:16-30):
# cold build -> full suite (incl. golden-file e2e snapshots) -> synthetic
# call+collapse integration gate under both error profiles.  One command
# from a clean checkout; .github/workflows/test.yml invokes exactly this.
ci: clean lib
	python -m pytest tests/test_[a-m]*.py -x -q
	python -m pytest tests/test_[n-z]*.py -x -q
	python benchmarks/validate.py --backend cpu --reads 400 --genome-kb 500 \
	    --loci 8 --threads 2 --min-recall 1.0 --min-precision 1.0
	python benchmarks/validate.py --backend cpu --reads 400 --genome-kb 500 \
	    --loci 8 --threads 2 --profile nanopore --min-recall 0.99

clean:
	rm -rf build ciri_long_tpu/_fastxcodec*.so
