"""Minimal skimage stand-in (scipy.ndimage-backed) for running the
reference pipeline on tiny test fixtures."""

from . import measure, morphology, segmentation, util  # noqa: F401
