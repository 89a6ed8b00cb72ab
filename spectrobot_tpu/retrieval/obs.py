"""Observation / pixel model (component C17, SURVEY.md).

The reference (fedef17/SpectRobot ``spect_main_module`` obs/pixel classes
[SURVEY.md 1.2]) carries observed spectra, noise and geometry per pixel with
spectral masks/windows.  TPU-native design: one :class:`Observation` of
dense [n_ray, n_chan] arrays; masking is encoded as INFINITE noise (weight
zero) so shapes stay static under jit — excluded channels simply do not
contribute to chi^2 or the normal equations, and the degrees-of-freedom
bookkeeping uses the mask count.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

_BIG_SIGMA = 1.0e30


@dataclasses.dataclass
class Observation:
    """A limb-scan (or nadir) observation set.

    y:       [n_ray, n_chan] measured radiances [W m-2 sr-1 (cm-1)-1]
    sigma:   [n_ray, n_chan] per-channel noise std
    mask:    [n_ray, n_chan] bool, True = channel used
    nu_channels: [n_chan] channel centers [cm-1]
    tangent_heights_m: [n_ray] (limb) or None
    sec_theta: [n_ray] (nadir) or None
    """

    y: np.ndarray
    sigma: np.ndarray
    mask: np.ndarray
    nu_channels: np.ndarray
    tangent_heights_m: Optional[np.ndarray] = None
    sec_theta: Optional[np.ndarray] = None

    @property
    def n_ray(self) -> int:
        return int(self.y.shape[0])

    @property
    def n_chan(self) -> int:
        return int(self.y.shape[1])

    @property
    def n_used(self) -> int:
        return int(self.mask.sum())

    def with_windows(self, windows: Sequence[Tuple[float, float]]) -> "Observation":
        """Restrict to spectral windows: channels outside every (lo, hi)
        interval are masked out (SURVEY.md C17 'masks/windows')."""
        inside = np.zeros(self.n_chan, dtype=bool)
        for lo, hi in windows:
            inside |= (self.nu_channels >= lo) & (self.nu_channels <= hi)
        return dataclasses.replace(
            self, mask=self.mask & inside[None, :])

    def flattened(self) -> Tuple[np.ndarray, np.ndarray]:
        """(y_flat, sigma_flat) for the OE loop; masked channels get
        sigma = 1e30 (zero weight, static shape)."""
        sig = np.where(self.mask, self.sigma, _BIG_SIGMA)
        return self.y.reshape(-1), sig.reshape(-1)

    def chi2_per_dof(self, chi2_meas: float) -> float:
        return chi2_meas / max(self.n_used, 1)

    # -- persistence --------------------------------------------------------

    def save_npz(self, path: str) -> None:
        arrays = dict(y=self.y, sigma=self.sigma, mask=self.mask,
                      nu_channels=self.nu_channels)
        if self.tangent_heights_m is not None:
            arrays["tangent_heights_m"] = self.tangent_heights_m
        if self.sec_theta is not None:
            arrays["sec_theta"] = self.sec_theta
        np.savez_compressed(path, **arrays)

    @staticmethod
    def load_npz(path: str) -> "Observation":
        with np.load(path) as z:
            return Observation(
                y=z["y"], sigma=z["sigma"], mask=z["mask"].astype(bool),
                nu_channels=z["nu_channels"],
                tangent_heights_m=z.get("tangent_heights_m"),
                sec_theta=z.get("sec_theta"))

    @staticmethod
    def synthesize(y_clean: np.ndarray, nu_channels: np.ndarray,
                   noise_sigma: float, seed: int = 0,
                   tangent_heights_m: Optional[np.ndarray] = None,
                   sec_theta: Optional[np.ndarray] = None) -> "Observation":
        """Simulated observation: clean radiances + white noise."""
        rng = np.random.default_rng(seed)
        y = y_clean + noise_sigma * rng.standard_normal(y_clean.shape)
        return Observation(
            y=y, sigma=np.full_like(y_clean, noise_sigma),
            mask=np.ones(y_clean.shape, dtype=bool),
            nu_channels=np.asarray(nu_channels),
            tangent_heights_m=tangent_heights_m, sec_theta=sec_theta)
