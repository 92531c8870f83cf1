# ocrd_keraslm_tpu build/test/bench targets
# (capability parity with the reference Makefile: deps/install/test/
#  docker; TPU-specific additions: bench, multichip dry run)

PYTHON ?= python
PIP ?= pip
TESTDIR = tests

help:
	@echo "Targets:"
	@echo "  deps          install runtime dependencies"
	@echo "  install       install this package (editable)"
	@echo "  test          run the test suite (CPU backend)"
	@echo "  test-asan     native C++ lane under ASAN+UBSAN (fuzz +"
	@echo "                differential suites on instrumented .so)"
	@echo "  test-training train a tiny model end-to-end via the CLI,"
	@echo "                then the flagship config to an absolute val"
	@echo "                char-ppl bound (reference-style quality gate)"
	@echo "  german-model  train pretrained/model_german.h5 (flagship"
	@echo "                w128 d2 l256 stateful on the synthetic-German"
	@echo "                corpus; used by tests/test_quality.py)"
	@echo "  bench         run the TPU benchmark (prints one JSON line)"
	@echo "  spotcheck     compiled-kernel parity checks on the real TPU"
	@echo "  multichip     dry-run the sharded train step on 8 virtual devices"
	@echo "  docker        build the docker image"

deps:
	$(PIP) install jax numpy h5py click networkx lxml optax orbax-checkpoint

install:
	$(PIP) install -e . --no-deps --no-build-isolation

test:
	$(PYTHON) -m pytest $(TESTDIR) -x -q

# native lane under ASAN+UBSAN (VERDICT r3 #2): rebuilds the three
# native_src/*.cpp with -fsanitize=address,undefined into a separate
# cache dir and runs the scanner fuzz (300 mutants), the three-lane
# differential and splice-preservation suites, and the decode-prep /
# stream-loader tests against the instrumented libraries.  libasan is
# LD_PRELOADed because python itself is uninstrumented; leak checking
# is off (the python interpreter's own arenas would drown the report).
ASAN_RT := $(shell g++ -print-file-name=libasan.so)
LIBSTDCXX := $(shell g++ -print-file-name=libstdc++.so.6)
# libstdc++ is preloaded WITH libasan so the __cxa_throw interceptor
# can resolve the real symbol at init (python loads libstdc++ lazily
# via extension modules; without the preload, jaxlib's MLIR bindings
# throwing StopIteration hit "real___cxa_throw != 0" CHECK-abort).
# ulimit: ASAN-inflated frames under jax's recursive HLO walk
# otherwise overflow the default 8MB stack.
test-asan:
	ulimit -s unlimited 2>/dev/null || true; \
	KERASLM_NATIVE_SANITIZE=1 \
	KERASLM_FUZZ_N=5000 \
	KERASLM_NATIVE_DIR=/tmp/keraslm_native_asan \
	LD_PRELOAD="$(ASAN_RT) $(LIBSTDCXX)" \
	ASAN_OPTIONS=detect_leaks=0:abort_on_error=1 \
	UBSAN_OPTIONS=print_stacktrace=1:halt_on_error=1 \
	$(PYTHON) -m pytest $(TESTDIR)/test_native.py \
	    $(TESTDIR)/test_page_native.py $(TESTDIR)/test_page_fuzz.py \
	    $(TESTDIR)/test_page_group.py -q

# trains a small model on generated text and round-trips all CLI
# commands (reference: make test TEST_TRAINING=1)
test-training:
	mkdir -p /tmp/keraslm_gt
	$(PYTHON) -c "import random; random.seed(0); words=['die','der','und','nicht','ist','von','zu','mit','sich','auf','wird','aber','kant','vernunft']; [open('/tmp/keraslm_gt/%s.txt'%n,'w').write('\n'.join(' '.join(random.choices(words,k=12)) for _ in range(200))) for n in ('goethe_werke_1808','kant_kritik_1781','schiller_werke_1781')]"
	KERASLM_PLATFORM=cpu $(PYTHON) -m ocrd_keraslm_tpu.scripts.run train -m /tmp/keraslm_gt/model.h5 -w 32 -d 1 -l 64 -e 3 /tmp/keraslm_gt/
	KERASLM_PLATFORM=cpu $(PYTHON) -m ocrd_keraslm_tpu.scripts.run test -m /tmp/keraslm_gt/model.h5 /tmp/keraslm_gt/kant_kritik_1781.txt
	KERASLM_PLATFORM=cpu $(PYTHON) -m ocrd_keraslm_tpu.scripts.run apply -m /tmp/keraslm_gt/model.h5 "die vernunft"
	KERASLM_PLATFORM=cpu $(PYTHON) -m ocrd_keraslm_tpu.scripts.run generate -m /tmp/keraslm_gt/model.h5 -n 10 "die "
	KERASLM_TEST_TRAINING=1 $(PYTHON) -m pytest $(TESTDIR)/test_quality.py::test_train_to_reference_quality -q

# flagship German model for the quality-parity tests (fast on TPU,
# ~15 min on CPU with KERASLM_PLATFORM=cpu)
german-model:
	mkdir -p /tmp/german_corpus pretrained
	$(PYTHON) -m ocrd_keraslm_tpu.utils.textgen --chars 3600000 --out /tmp/german_corpus
	cd /tmp && KERASLM_CKPT_DIR=/tmp/german_ckpt $(PYTHON) -m ocrd_keraslm_tpu.scripts.run train \
		-m $(abspath pretrained/model_german.h5) -C /tmp/german_ckpt/ckpt.h5 \
		-w 128 -d 2 -l 256 -e 400 /tmp/german_corpus/*.txt

bench:
	$(PYTHON) bench.py

spotcheck:
	$(PYTHON) tpu_spotcheck.py

multichip:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 $(PYTHON) __graft_entry__.py 8

docker:
	docker build -t ocrd/keraslm_tpu .

.PHONY: help deps install test test-asan test-training bench spotcheck multichip docker
