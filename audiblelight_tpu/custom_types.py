"""Custom data types, protocols and wrappers used across the pipeline.

API parity with reference audiblelight/custom_types.py:1-89.
"""

from functools import cached_property
from pathlib import Path
from typing import Any, Callable, Protocol, Union

import numpy as np

# Numeric dtypes: useful for isinstance(x, ...) checking
NUMERIC_DTYPES = (
    int,
    float,
    complex,
    np.integer,
    np.floating,
)
Numeric = Union[int, float, complex, np.integer, np.floating]
Filepath = Union[str, Path]

AUDIO_EXTS = ("wav", "mp3", "mpeg4", "m4a", "flac", "aac")
IMAGE_EXTS = (
    "jpg",
    "jpeg",
    "png",
    "pdf",
    "gif",
    "tiff",
    "webp",
    "eps",
    "svg",
    "raw",
)


class DistributionLike(Protocol):
    """Typing protocol for any distribution-like object exposing `rvs()`."""

    def rvs(self, *args: Any, **kwargs: Any) -> Numeric:  # pragma: no cover
        ...


class DistributionWrapper:
    """Wraps a callable as a distribution-like object with an `rvs()` method.

    `.max` / `.min` return cached empirical 97.5 / 2.5 percentiles over
    ``N_SAMPLES`` draws (used e.g. to validate predefined-trajectory velocity).
    """

    N_SAMPLES = 1000

    def __init__(self, distribution: Callable):
        self.distribution = distribution

    def rvs(self, *_: Any, **__: Any) -> Numeric:
        return self.distribution()

    def __call__(self) -> Numeric:
        return self.rvs()

    @cached_property
    def max(self) -> Numeric:
        """Acceptable maximum: empirical 97.5th percentile over N_SAMPLES draws."""
        return np.nanquantile(
            np.array([self.rvs() for _ in range(self.N_SAMPLES)]), 0.975
        )

    @cached_property
    def min(self) -> Numeric:
        """Acceptable minimum: empirical 2.5th percentile over N_SAMPLES draws."""
        return np.nanquantile(
            np.array([self.rvs() for _ in range(self.N_SAMPLES)]), 0.025
        )
