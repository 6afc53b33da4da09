# Development targets for audiblelight_tpu

.PHONY: tests native bench clean lint

native:
	g++ -O3 -shared -fPIC -o cpp/libgeom.so cpp/geomlib.cpp
	-gcc -O2 -shared -fPIC -o cpp/libh264mux.so cpp/h264mux.c -lavformat -lavcodec -lavutil

tests: native
	python -m pytest tests/ -x -q -m "not e2e"

tests-all: native
	python -m pytest tests/ -x -q

tests-parallel: native
	python -m pytest tests/ -q -p no:cacheprovider

bench:
	python bench.py

lint:
	python -m compileall -q audiblelight_tpu scripts bench.py __graft_entry__.py

clean:
	rm -f cpp/libgeom.so
	find . -name __pycache__ -type d -exec rm -rf {} +
