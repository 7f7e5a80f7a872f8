.PHONY: all lib test bench clean

all: lib

# build the native fastx codec extension in-place
lib:
	python setup.py build_ext --inplace

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -rf build ciri_long_tpu/_fastxcodec*.so
