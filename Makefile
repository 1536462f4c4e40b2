.PHONY: native test bench clean

native:
	./csrc/build.sh

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_se3.py tests/test_geom.py tests/test_voxel.py \
	  tests/test_pallas_kernels.py tests/test_posegraph.py \
	  tests/test_capacity.py tests/test_profiling.py -q

bench:
	python bench.py

clean:
	rm -f tpuslam/data/_libtum_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
