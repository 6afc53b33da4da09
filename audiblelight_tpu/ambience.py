"""Background ambience: colored noise or looped audio files for a Scene.

API parity with reference audiblelight/ambience.py:26-400 (Ambience class with
channels/duration/sample_rate/ref_db + filepath-or-noise, colored noise via
Timmer & Koenig power-law PSD shaping). The host generator below reproduces the
reference's exact RNG draw sequence (np.random.default_rng(seed).normal twice)
so seeded outputs match bit-for-bit; a batched JAX variant lives in
audiblelight_tpu.ops.noise for on-device generation.
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Any, Iterable, Optional, Union

import numpy as np

from audiblelight_tpu import config, custom_types, utils
from audiblelight_tpu.io.audio import load_audio, valid_audio
from audiblelight_tpu.micarrays import _compare_dicts
from audiblelight_tpu.utils import logger

# Map of colour names to beta exponents; higher beta = more low-frequency energy
NOISE_MAPPING = dict(pink=1, brown=2, red=2, blue=-1, white=0, violet=-2)


class Ambience:
    """Persistent background noise for a Scene."""

    def __init__(
        self,
        channels: int,
        duration: custom_types.Numeric,
        alias: str,
        filepath: Optional[Union[str, Path]] = None,
        noise: Optional[Union[str, custom_types.Numeric]] = None,
        ref_db: Optional[custom_types.Numeric] = config.DEFAULT_REF_DB,
        sample_rate: Optional[custom_types.Numeric] = config.SAMPLE_RATE,
        **kwargs,
    ):
        """Initialise invariant background noise for a Scene.

        Either `filepath` (an audio file, tiled over channels/duration) or `noise`
        (a colour name, "gaussian", or a numeric beta exponent) must be given.
        Extra kwargs pass through to `powerlaw_psd_gaussian`.
        """
        self.channels = utils.sanitise_positive_number(channels, cast_to=int)
        self.sample_rate = utils.sanitise_positive_number(sample_rate, cast_to=int)
        self.duration = utils.sanitise_positive_number(duration)
        self.alias = alias

        if noise is None and filepath is not None:
            self.filepath, self.beta = utils.sanitise_filepath(filepath), None
        elif noise is not None and filepath is None:
            self.filepath, self.beta = None, _parse_beta(noise)
        elif noise is not None and filepath is not None:
            raise AttributeError("Only one of `noise` or `filepath` should be provided.")
        else:
            raise AttributeError("One of `noise` or `filepath` must be provided")

        utils.validate_kwargs(powerlaw_psd_gaussian, **kwargs)
        self.noise_kwargs = kwargs

        # The noise floor must be a negative dB value
        utils.sanitise_positive_number(-ref_db)
        self.ref_db = ref_db

        self.audio = None

    def __eq__(self, other: Any) -> bool:
        if not isinstance(other, Ambience):
            return False
        return _compare_dicts(self.to_dict(), other.to_dict())

    def __str__(self) -> str:
        loaded = "loaded" if self.is_audio_loaded else "unloaded"
        return f"'Ambience' with alias '{self.alias}' (currently {loaded})."

    def __repr__(self) -> str:
        return utils.repr_as_json(self)

    @property
    def is_audio_loaded(self) -> bool:
        """True when audio has been generated/loaded and is valid."""
        if self.audio is None:
            return False
        try:
            return valid_audio(self.audio)
        except (TypeError, ValueError):
            return False

    def load_ambience(
        self, ignore_cache: Optional[bool] = False, normalize: Optional[bool] = True
    ) -> np.ndarray:
        """Load/generate the ambience as a (channels, samples) array."""
        if self.is_audio_loaded and not ignore_cache:
            return self.audio

        total_samples = round(self.duration * self.sample_rate)

        if self.beta is not None:
            shape = (self.channels, total_samples)
            if self.beta == "gaussian":
                # float32 + PCG: a 60 s 4-channel bed is ~6M samples, and the
                # legacy float64 path cost seconds of host time per scene on
                # the production pipeline (the bed is a -65 dB noise floor;
                # precision is irrelevant). Seeding the fast generator from
                # the global stream keeps renders reproducible under
                # np.random.seed (the draw VALUES differ from the legacy
                # float64 path, but the stream is still deterministic).
                out = np.random.default_rng(
                    np.random.randint(0, 2**31)
                ).standard_normal(shape, dtype=np.float32)
            else:
                out = powerlaw_psd_gaussian(self.beta, shape, **self.noise_kwargs)
        else:
            ambient, _ = load_audio(self.filepath, sr=self.sample_rate, mono=False)
            ambient = utils.coerce2d(ambient)
            n_audio_channels, n_samples = ambient.shape

            if n_audio_channels != self.channels:
                if n_audio_channels == 1:
                    ambient = ambient[0, :]
                else:
                    logger.warning(
                        f"Passed audio has {n_audio_channels} channels, but expected "
                        f"{self.channels} channels. A random mono channel will be chosen."
                    )
                    ambient = ambient[random.choice(range(n_audio_channels)), :]
                tile_channels = self.channels
            else:
                tile_channels = 1

            repeats = -(-total_samples // n_samples)  # ceiling division
            out = np.tile(utils.coerce2d(ambient), (tile_channels, repeats))[:, :total_samples]

        if normalize:
            # Vectorised per-channel peak normalisation; bitwise identical to
            # the per-channel loop (max(|x| + tiny) == max|x| + tiny for a
            # dtype-constant tiny). float32 input stays float32 (the fast
            # gaussian path); everything else keeps the float64 contract.
            if out.dtype != np.float32:
                out = np.asarray(out, dtype=np.float64)
            # max(max, -min) == max|x| exactly, without materialising |x|
            # (the abs pass allocated a full bed-sized temporary per scene)
            peak = np.maximum(
                np.max(out, axis=1, keepdims=True),
                -np.min(out, axis=1, keepdims=True),
            ) + utils.tiny(out)
            out /= peak

        self.audio = out
        return self.audio

    def to_dict(self) -> dict:
        """Metadata for this object as a dictionary."""
        return dict(
            alias=self.alias,
            beta=self.beta,
            filepath=str(self.filepath) if self.filepath is not None else None,
            channels=self.channels,
            sample_rate=self.sample_rate,
            duration=self.duration,
            ref_db=self.ref_db,
            noise_kwargs=self.noise_kwargs,
        )

    @classmethod
    def from_dict(cls, input_dict: dict[str, Any]) -> "Ambience":
        """Instantiate Ambience from a dictionary."""
        for k in ["alias", "filepath", "duration", "ref_db", "beta", "channels"]:
            if k not in input_dict:
                raise KeyError(f"Missing key: '{k}'")
        return cls(
            channels=input_dict["channels"],
            sample_rate=input_dict["sample_rate"],
            alias=input_dict["alias"],
            filepath=input_dict["filepath"],
            duration=input_dict["duration"],
            noise=input_dict["beta"],
            ref_db=input_dict["ref_db"],
            **input_dict.get("noise_kwargs", {}),
        )


def powerlaw_psd_gaussian(
    beta: custom_types.Numeric,
    shape: Union[int, Iterable[int]],
    fmin: Optional[custom_types.Numeric] = 0.0,
    seed: Optional[int] = utils.SEED,
) -> np.ndarray:
    """Generate Gaussian (1/f)^beta noise (Timmer & Koenig 1995 spectral shaping).

    The last dimension of `shape` is time; all other axes are independent.
    Output is normalised to approximately unit variance and zero mean. RNG draw
    order matches the reference (ambience.py:271-375) for seeded bit parity.
    """
    if isinstance(shape, (np.integer, int)):
        size = [shape]
    elif isinstance(shape, Iterable):
        size = list(shape)
    else:
        raise ValueError(f"Argument `shape` must be int or Iterable[int] but got {type(shape)}")

    samples = size[-1]
    f = np.fft.rfftfreq(samples)

    fmin = utils.sanitise_positive_number(fmin)
    if 0 <= fmin <= 0.5:
        fmin = max(fmin, 1.0 / (samples + utils.tiny(float(samples))))
    else:
        raise ValueError(f"Argument `fmin` must be chosen between 0 and 0.5 but got {fmin:.2f}.")

    s_scale = f.copy()
    ix = np.sum(s_scale < fmin)
    if ix and ix < len(s_scale):
        s_scale[:ix] = s_scale[ix]
    s_scale = s_scale ** (-beta / 2.0)

    # Theoretical output standard deviation from the scaling
    w = s_scale[1:].copy()
    w[-1] *= (1 + (samples % 2)) / 2.0
    sigma = 2 * np.sqrt(np.sum(w**2)) / (samples + utils.tiny(float(samples)))

    size[-1] = len(f)
    dims_to_add = len(size) - 1
    s_scale = s_scale[(np.newaxis,) * dims_to_add + (Ellipsis,)]

    rng = np.random.default_rng(seed)
    sr = rng.normal(scale=s_scale, size=size)
    si = rng.normal(scale=s_scale, size=size)

    if not (samples % 2):
        si[..., -1] = 0
        sr[..., -1] *= np.sqrt(2)
    si[..., 0] = 0
    sr[..., 0] *= np.sqrt(2)

    y = np.fft.irfft(sr + 1j * si, n=samples, axis=-1)
    y /= sigma
    return y


def _parse_beta(noise: Any) -> Union[float, str]:
    """Parse a noise colour name, "gaussian", or numeric beta exponent."""
    if isinstance(noise, str):
        if noise in NOISE_MAPPING:
            return NOISE_MAPPING[noise]
        if noise.lower() == "gaussian":
            return "gaussian"
        keys = ", ".join(NOISE_MAPPING.keys())
        raise KeyError(f"Expected a string in {keys} but got {noise}.")
    if isinstance(noise, custom_types.NUMERIC_DTYPES):
        return noise
    raise TypeError(f"Expected either a string or numeric input, but got {type(noise)}.")
