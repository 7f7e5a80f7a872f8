.PHONY: all lib test bench clean ci

all: lib

# build the native fastx codec extension in-place
lib:
	python setup.py build_ext --inplace

test:
	python -m pytest tests/ -q

bench:
	python bench.py

# the CI contract (mirrors the reference's .github/workflows/test.yml:16-30):
# cold build -> full suite (incl. golden-file e2e snapshots) -> synthetic
# call+collapse integration gate under both error profiles.  One command
# from a clean checkout; .github/workflows/test.yml invokes exactly this.
ci: clean lib
	python -m pytest tests/ -x -q
	python benchmarks/validate.py --backend cpu --reads 400 --genome-kb 500 \
	    --loci 8 --threads 2 --min-recall 1.0 --min-precision 1.0
	python benchmarks/validate.py --backend cpu --reads 400 --genome-kb 500 \
	    --loci 8 --threads 2 --profile nanopore --min-recall 0.99

clean:
	rm -rf build ciri_long_tpu/_fastxcodec*.so
