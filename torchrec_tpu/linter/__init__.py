"""Docstring linter (reference torchrec/linter/)."""
from torchrec_tpu.linter.docstring_linter import lint_package, LintViolation

__all__ = ["lint_package", "LintViolation"]
