"""Build and run the native C++ test binaries.

Reference analogs: the gtest suites under test/cpp/dynamic_embedding/ and
inference_legacy/tests/ (BatchingQueueTest.cpp etc.); here plain
assert-based binaries driving the same C ABI Python uses.
"""

import os
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_and_run(test_cc: str, so_path: str, tmp_path):
    exe = str(tmp_path / "native_test")
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-pthread", "-o", exe, test_cc, "-ldl"],
        check=True,
    )
    out = subprocess.run(
        [exe, so_path], capture_output=True, text=True, timeout=120
    )
    assert out.returncode == 0, out.stderr + out.stdout
    assert "PASS" in out.stdout


def test_serving_native(tmp_path):
    # ensure the lazily-built .so exists (python side builds it)
    from torchrec_tpu.inference.serving import _lib

    _lib()
    _build_and_run(
        os.path.join(ROOT, "cpp", "tests", "serving_test.cc"),
        os.path.join(ROOT, "cpp", "inference", "libserving.so"),
        tmp_path,
    )


def test_dynamic_embedding_native(tmp_path):
    from torchrec_tpu.dynamic_embedding import _lib

    _lib()
    _build_and_run(
        os.path.join(ROOT, "cpp", "tests", "dynamic_embedding_test.cc"),
        os.path.join(ROOT, "cpp", "dynamic_embedding", "libtde.so"),
        tmp_path,
    )
