# Development targets for audiblelight_tpu

.PHONY: tests native bench clean lint coverage

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
	python tools/lint.py

# Line coverage via the framework's own sys.monitoring collector
# (tools/al_coverage.py) — the image ships no coverage.py. The reference
# gates at 90% (its codecov.yml); the in-tree gate is 80% to absorb the
# collector's stricter denominator (module-level constants, TPU-only paths
# that CPU tests cannot reach).
coverage: native
	rm -rf .coverage_al
	AL_COVERAGE=1 python -m pytest tests/ -q -m "not e2e" -p no:cacheprovider
	python tools/coverage_report.py --fail-under 80

clean:
	rm -f cpp/libgeom.so
	find . -name __pycache__ -type d -exec rm -rf {} +
