"""Physically-modeled photon-noise grain parameters from an ISO value.

Replaces the av1-grain crate's generate_photon_noise_params (itself a
port of libaom's tools/photon_noise_table.c), used by the ``generate``
pipeline (reference grav1synth src/main.rs:245-311). The model:

- A full-frame (36x24mm) sensor is assumed; the frame resolution sets
  the pixel pitch and hence the photon count per pixel.
- At the ISO-implied mid-tone exposure (H = 10/ISO lux-seconds), the
  mid-gray (18%) electron count follows from the photon flux constant
  (~11260 photons/lux-second/um^2) and a 20% effective quantum
  efficiency.
- Noise in electrons at a given signal: shot noise (Poisson), input-
  referred read noise, and photo-response non-uniformity, summed in
  quadrature.
- The electron-domain sigma is taken to the encoded domain through the
  transfer function's derivative (BT.1886 gamma or SMPTE 2084 PQ) and
  expressed as AV1 scaling-function values for a lag-0 grain pattern.

The batched curve evaluation is jittable (vectorized over the 14 point
positions); table generation is host-called once per stream.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from ..obu.types import FilmGrainParams, GrainTableSegment
from .tables_data import GAUSSIAN_SEQUENCE

# sensor / exposure model constants (matching the libaom tool)
PHOTONS_PER_LUX_SECOND_PER_UM2 = 11260.0
EFFECTIVE_QUANTUM_EFFICIENCY = 0.20
PHOTO_RESPONSE_NON_UNIFORMITY = 0.005
INPUT_REFERRED_READ_NOISE = 1.5
SENSOR_WIDTH_UM = 36_000.0
SENSOR_HEIGHT_UM = 24_000.0
MID_GRAY = 0.18

NUM_POINTS = 14
DEFAULT_SEED = 7391


# -- transfer functions -----------------------------------------------------


class Bt1886:
    """BT.1886 display EOTF (gamma 2.4), normalized to [0, 1]."""

    @staticmethod
    def to_linear(e: np.ndarray) -> np.ndarray:
        return np.power(np.clip(e, 0.0, 1.0), 2.4)

    @staticmethod
    def eotf_derivative(e: np.ndarray) -> np.ndarray:
        e = np.clip(e, 1e-6, 1.0)
        return 2.4 * np.power(e, 1.4)

    mid_gray_encoded = math.pow(MID_GRAY, 1.0 / 2.4)
    peak_luminance_nits = 100.0


class Smpte2084:
    """SMPTE 2084 (PQ) EOTF, normalized so 1.0 = 10000 nits."""

    M1 = 2610.0 / 16384
    M2 = 128.0 * 2523.0 / 4096
    C1 = 3424.0 / 4096
    C2 = 32.0 * 2413.0 / 4096
    C3 = 32.0 * 2392.0 / 4096

    @classmethod
    def to_linear(cls, e: np.ndarray) -> np.ndarray:
        e = np.clip(e, 0.0, 1.0)
        ep = np.power(e, 1.0 / cls.M2)
        num = np.maximum(ep - cls.C1, 0.0)
        den = cls.C2 - cls.C3 * ep
        return np.power(num / np.maximum(den, 1e-10), 1.0 / cls.M1)

    @classmethod
    def eotf_derivative(cls, e: np.ndarray) -> np.ndarray:
        # numerical derivative is ample here (smooth, monotone curve)
        eps = 1e-5
        lo = cls.to_linear(np.maximum(e - eps, 0.0))
        hi = cls.to_linear(np.minimum(e + eps, 1.0))
        return (hi - lo) / (2 * eps)

    # PQ reference: SDR mid-gray at ~26 nits of the 10000-nit range
    mid_gray_encoded = None  # computed below
    peak_luminance_nits = 10000.0


# encoded value whose linear luminance is 18% of 100 nits in PQ terms
Smpte2084.mid_gray_encoded = float(
    np.interp(
        MID_GRAY * 100.0 / 10000.0,
        Smpte2084.to_linear(np.linspace(0, 1, 4096)),
        np.linspace(0, 1, 4096),
    )
)

# stddev of the lag-0 AV1 grain base: gaussian_sequence samples are
# drawn uniformly, then right-shifted by (12 - bit_depth); in 8-bit
# scaling terms one grain unit is sigma(gauss)/2^4.
_GAUSS_SIGMA = float(np.std(GAUSSIAN_SEQUENCE.astype(np.float64)))


def _noise_curve(
    iso: float,
    width: int,
    height: int,
    transfer,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (encoded positions [0,1], encoded-domain noise sigma)."""
    pixel_area_um2 = (SENSOR_WIDTH_UM / width) * (SENSOR_HEIGHT_UM / height)
    mid_tone_exposure_lux_s = 10.0 / iso
    electrons_mid = (
        mid_tone_exposure_lux_s
        * PHOTONS_PER_LUX_SECOND_PER_UM2
        * pixel_area_um2
        * EFFECTIVE_QUANTUM_EFFICIENCY
    )
    e = np.linspace(0.0, 1.0, NUM_POINTS)
    # evaluate the black point half a code value up: the EOTF derivative
    # vanishes at 0 and would send the first scaling value to the cap
    e_eval = np.maximum(e, 0.5 / 255.0)
    linear = transfer.to_linear(e_eval)
    # linear luminance relative to mid-gray of an SDR scene; PQ encodes
    # absolute luminance, so rescale so that mid-gray lands at 18%
    if transfer is Smpte2084:
        scene_linear = linear * (10000.0 / 100.0)
    else:
        scene_linear = linear
    electrons = electrons_mid * scene_linear / MID_GRAY
    sigma_e = np.sqrt(
        INPUT_REFERRED_READ_NOISE**2
        + np.maximum(electrons, 0.0)
        + (PHOTO_RESPONSE_NON_UNIFORMITY * electrons) ** 2
    )
    sigma_linear = sigma_e / electrons_mid * MID_GRAY
    if transfer is Smpte2084:
        sigma_linear = sigma_linear / (10000.0 / 100.0)
    deriv = np.maximum(transfer.eotf_derivative(e_eval), 1e-6)
    sigma_encoded = sigma_linear / deriv
    return e, sigma_encoded


def generate_photon_noise_params(
    iso: float,
    width: int,
    height: int,
    transfer_function: str = "bt1886",  # or "smpte2084"
    chroma: bool = False,
    seed: int = DEFAULT_SEED,
) -> FilmGrainParams:
    """Build lag-0 grain parameters whose scaling curve models photon
    noise at the given ISO for this resolution."""
    transfer = Smpte2084 if transfer_function == "smpte2084" else Bt1886
    e, sigma = _noise_curve(iso, width, height, transfer)

    # choose scaling_shift so the peak scaling value fits in [0, 255]:
    # applied sigma (8-bit units) = scaling * sigma_g8 / 2^shift with
    # sigma_g8 = sigma(gaussian)/2^4
    sigma_g8 = _GAUSS_SIGMA / 16.0
    target = sigma * 255.0  # desired pixel-domain sigma, 8-bit units
    scaling_shift = 8
    while scaling_shift < 11:
        vals = target * (1 << scaling_shift) / sigma_g8
        if vals.max() <= 255.0:
            break
        scaling_shift += 1
    else:
        vals = target * (1 << 11) / sigma_g8
    # smaller shifts quantize coarser; if everything is tiny, keep 8
    vals = target * (1 << scaling_shift) / sigma_g8
    points = []
    for x, v in zip(e, vals):
        points.append((int(round(x * 255.0)), int(np.clip(round(v), 0, 255))))
    # deduplicate x positions (monotonically increasing required)
    dedup = []
    for x, y in points:
        if dedup and x <= dedup[-1][0]:
            continue
        dedup.append((x, y))

    p = FilmGrainParams(
        grain_seed=seed & 0xFFFF,
        scaling_points_y=dedup,
        scaling_shift=scaling_shift,
        ar_coeff_lag=0,
        ar_coeffs_y=[],
        ar_coeffs_cb=[0],
        ar_coeffs_cr=[0],
        ar_coeff_shift=6,
        grain_scale_shift=0,
        overlap_flag=True,
        clip_to_restricted_range=False,
    )
    if chroma:
        # chroma carries the same curve; neutral mults make the chroma
        # plane's own intensity drive the lookup
        p.scaling_points_cb = list(dedup[:10])
        p.scaling_points_cr = list(dedup[:10])
        p.cb_mult = 192
        p.cb_luma_mult = 128
        p.cb_offset = 256
        p.cr_mult = 192
        p.cr_luma_mult = 128
        p.cr_offset = 256
    return p


def photon_noise_segment(
    iso: float,
    width: int,
    height: int,
    transfer_function: str = "bt1886",
    chroma: bool = False,
    seed: int = DEFAULT_SEED,
) -> GrainTableSegment:
    """Whole-file segment (the generate pipeline's contract: one segment
    spanning [0, u64::MAX), reference main.rs:288-306)."""
    params = generate_photon_noise_params(
        iso, width, height, transfer_function, chroma, seed
    )
    return GrainTableSegment(0, 2**63 - 1, params)
