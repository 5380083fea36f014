"""Docstring conventions enforced in CI (reference torchrec/linter/)."""

import os

from torchrec_tpu.linter import lint_package


def test_package_docstrings_clean():
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "torchrec_tpu",
    )
    violations = lint_package(root)
    assert not violations, "\n".join(str(v) for v in violations)
