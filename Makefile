# Developer entry points (the reference's Makefile analogue).
PY ?= python

.PHONY: test bench soak native quantize inspect regress clean

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

# minutes-long FleetManager soak under stream churn on the real chip
# (VOX_SOAK_* env knobs — see tools/soak_serving.py)
soak:
	$(PY) tools/soak_serving.py

# build the native C++ audio frontend explicitly (auto-built on first use)
native:
	g++ -O3 -shared -fPIC -std=c++17 -o native/libvoxaudio.so native/voxaudio.cpp

# usage: make quantize MODEL=path/to/model_dir OUT=path/to/q8_dir
quantize:
	$(PY) tools/quantize.py $(MODEL) $(OUT)

# usage: make inspect MODEL=path/to/model_dir
inspect:
	$(PY) tools/inspect_weights.py $(MODEL) --summary

# usage: make regress MODEL=path/to/model_dir  (needs real weights)
regress:
	$(PY) tools/runtest.py -d $(MODEL)

clean:
	rm -f native/libvoxaudio.so
	find . -name __pycache__ -type d -exec rm -rf {} +
