"""Device-side DSP primitives (JAX/XLA/Pallas).

These are the compute kernels of the framework: STFT/iSTFT, time-invariant and
time-variant FFT convolution, IR normalisation and level scaling, colored-noise
synthesis, and polyphase resampling. All functions are jit-compatible, operate on
fixed shapes, and batch across (scenes x events x mics x capsules).
"""

from audiblelight_tpu.ops.convolve import (
    fft_convolve,
    interpolation_matrix,
    time_variant_convolve_spec,
    tv_convolve,
)
from audiblelight_tpu.ops.scaling import (
    apply_snr,
    db_to_multiplier,
    normalize_irs,
    pad_or_truncate_audio,
    peak_normalize,
)
from audiblelight_tpu.ops.stft import istft_overlap_add, stft
from audiblelight_tpu.ops.noise import powerlaw_psd_gaussian_jax

__all__ = [
    "stft",
    "istft_overlap_add",
    "fft_convolve",
    "tv_convolve",
    "time_variant_convolve_spec",
    "interpolation_matrix",
    "apply_snr",
    "db_to_multiplier",
    "normalize_irs",
    "peak_normalize",
    "pad_or_truncate_audio",
    "powerlaw_psd_gaussian_jax",
]
