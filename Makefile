# Build/test entry points (the reference's Bazel targets, make-shaped).
.PHONY: test native bench clean

test:
	python -m pytest tests/ -q

# Native data-path library (compiled on demand by llm_inference_tpu.native,
# but `make native` builds it eagerly and prints the cached .so path).
native:
	python -c "from llm_inference_tpu.native import get_lib; lib = get_lib(); \
	print('native lib:', lib._name if lib else 'UNAVAILABLE (no g++?)')"

bench:
	python bench.py

clean:
	rm -f /tmp/llmi_native_*.so /tmp/llmi_oracle_*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
