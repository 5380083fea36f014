"""Build and run the native C++ test binaries.

Reference analogs: the gtest suites under test/cpp/dynamic_embedding/ and
torchrec/inference/tests/ (BatchingQueueTest.cpp etc.); here gtest-style
binaries (cpp/tests/minitest.h harness — the image ships no gtest) driving
the same C ABI Python uses.
"""

import os
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_and_run(test_cc: str, so_path: str, tmp_path, extra_args=()):
    exe = str(tmp_path / "native_test")
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-pthread",
         "-I", os.path.join(ROOT, "cpp", "tests"),
         "-o", exe, test_cc, "-ldl"],
        check=True,
    )
    out = subprocess.run(
        [exe, so_path, *extra_args], capture_output=True, text=True,
        timeout=120,
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
    # the Plugin suite needs the dirstore example backend built as a .so
    plugin = str(tmp_path / "libtde_dirstore.so")
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
         "-I", os.path.join(ROOT, "cpp", "dynamic_embedding"),
         "-o", plugin,
         os.path.join(ROOT, "cpp", "dynamic_embedding",
                      "io_plugin_example.cc")],
        check=True,
    )
    _build_and_run(
        os.path.join(ROOT, "cpp", "tests", "dynamic_embedding_test.cc"),
        os.path.join(ROOT, "cpp", "dynamic_embedding", "libtde.so"),
        tmp_path,
        extra_args=(plugin,),
    )


def test_criteo_loader_native(tmp_path):
    from torchrec_tpu.datasets.criteo_native import _lib

    _lib()
    _build_and_run(
        os.path.join(ROOT, "cpp", "tests", "criteo_loader_test.cc"),
        os.path.join(ROOT, "cpp", "data", "libcriteo.so"),
        tmp_path,
    )
