"""Optimal-estimation / Levenberg-Marquardt inversion (C16, SURVEY.md 4.2).

The reference (fedef17/SpectRobot ``spect_main_module`` LM driver [SURVEY.md
1.2]) iterates forward + Jacobian to fit limb-scan spectra.  TPU-native
design: the LM ITERATION (solve, chi^2, lambda bookkeeping) is a pure jitted
function of (x, K, F, lambda); the OUTER loop runs on the host because each
iteration's Jacobian is a fresh device computation and convergence control is
control flow the host does better (SURVEY.md C16: "host-orchestrated loop;
linear algebra on chip").

Per-iteration state is checkpointed (utils/checkpoint.py) and logged as
structured JSONL (utils/runlog.py) — the failure-recovery story of SURVEY.md
section 6: restart re-enters at the last completed iteration.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class OEConfig:
    max_iter: int = 20
    lm_lambda0: float = 1.0e-2
    lm_up: float = 10.0          # lambda multiplier on rejected step
    lm_down: float = 0.3         # lambda multiplier on accepted step
    chi2_rel_tol: float = 1e-3   # convergence: relative chi2 change
    dx2_tol: float = 0.1         # convergence: d-squared < tol * n_x (Rodgers)
    lambda_max: float = 1e8


@dataclasses.dataclass
class RetrievalResult:
    x: np.ndarray                # retrieved flat state
    chi2: float                  # final total cost (measurement + prior)
    chi2_meas: float
    n_iter: int
    converged: bool
    S_hat: np.ndarray            # posterior covariance
    A_kernel: np.ndarray         # averaging-kernel matrix
    dof: float                   # degrees of freedom for signal, tr(A)
    history: List[Dict]          # per-iteration records
    K: np.ndarray                # final Jacobian
    # WHY the loop stopped (honest convergence reporting, VERDICT.md
    # round-2 weak item 7): "d2_tol" / "chi2_tol" (converged), "max_iter"
    # (budget exhausted — chi2 may still have been improving; see
    # history[-1]["accepted"]), "lambda_max" (LM stalled: no damping
    # produced an acceptable step).
    stop_reason: str = ""


def _chi2_terms(y, F, x, x_a, inv_se_diag, S_a_inv):
    """Host-side (float64 numpy) chi^2 bookkeeping."""
    r = np.asarray(y, np.float64) - np.asarray(F, np.float64)
    meas = float(np.dot(r * np.asarray(inv_se_diag, np.float64), r))
    dxa = np.asarray(x, np.float64) - np.asarray(x_a, np.float64)
    prior = float(dxa @ (np.asarray(S_a_inv, np.float64) @ dxa))
    return meas, prior


def _lm_solve(x, H, g, x_a, S_a_inv, lam):
    """LM solve from pre-assembled normal equations (float64 host):

        (H + S_a^-1 + lam*diag(S_a^-1)) dx = g - S_a^-1 (x - x_a)

    with H = K^T Se^-1 K and g = K^T Se^-1 (y - F).  This is the entry the
    DISTRIBUTED path uses: (H, g) arrive psum-assembled from the mesh
    (parallel/oe.py) and only O(n_x^2) numbers ever reach the host."""
    x64 = np.asarray(x, np.float64)
    H64 = np.asarray(H, np.float64)
    Sai = np.asarray(S_a_inv, np.float64)
    A = H64 + Sai + lam * np.diag(np.diag(Sai))
    b = np.asarray(g, np.float64) - Sai @ (x64 - np.asarray(x_a, np.float64))
    dx = np.linalg.solve(A, b)
    d2 = float(dx @ b)     # Rodgers convergence metric
    return x64 + dx, dx, d2


def _lm_step(x, K, F, y, x_a, inv_se_diag, S_a_inv, lam):
    """One LM solve:  (K^T Se^-1 K + S_a^-1 + lam*diag(S_a^-1)) dx = b.

    Done in FLOAT64 NUMPY on the host: the normal equations routinely carry
    condition numbers ~1e6+, and a float32 on-device solve produces garbage
    steps (observed: |dx| ~ 4000 K on a TPU f32 retrieval that converges in
    3 iterations in f64).  The solve is O(n_x^2) — microseconds next to the
    device-side forward/Jacobian (SURVEY.md C16 "host-orchestrated loop").
    """
    x64 = np.asarray(x, np.float64)
    K64 = np.asarray(K, np.float64)
    w = np.asarray(inv_se_diag, np.float64)
    Sai = np.asarray(S_a_inv, np.float64)
    KtSe = K64.T * w[None, :]
    H = KtSe @ K64 + Sai
    A = H + lam * np.diag(np.diag(Sai))
    b = KtSe @ (np.asarray(y, np.float64) - np.asarray(F, np.float64))         - Sai @ (x64 - np.asarray(x_a, np.float64))
    dx = np.linalg.solve(A, b)
    d2 = float(dx @ b)     # Rodgers convergence metric
    return x64 + dx, dx, d2


def retrieve(
    forward_flat: Callable[[jnp.ndarray], jnp.ndarray],
    jacobian: Callable[[jnp.ndarray], jnp.ndarray],
    y: jnp.ndarray,
    x0: jnp.ndarray,
    x_a: jnp.ndarray,
    S_a: np.ndarray,
    noise_sigma: jnp.ndarray,
    cfg: OEConfig = OEConfig(),
    logger=None,
    checkpointer=None,
    normal_eqs=None,
    state_check=None,
) -> RetrievalResult:
    """Run the OE/LM loop to convergence (config 5, BASELINE.json:11).

    forward_flat / jacobian: flat-state callables (see retrieval.state).
    noise_sigma: per-channel measurement noise (diagonal S_eps).
    logger: optional utils.runlog.RunLogger; checkpointer: optional
    utils.checkpoint.Checkpointer (resume supported via its ``latest()``).

    normal_eqs: optional x -> (F, H, g) with H = K^T Se^-1 K and
    g = K^T Se^-1 (y - F) pre-assembled ON DEVICE — the distributed path
    (parallel/oe.py): each LM iteration then moves only O(n_x^2) numbers to
    the host and never materialises K.  ``jacobian`` is still used ONCE
    after convergence for the posterior/averaging-kernel diagnostics (the
    sharded path passes its ICI all_gather Jacobian there).

    state_check: optional x -> str | None, called on every ACCEPTED state;
    a returned message is warned and logged ("physics_warning" record) but
    does not stop the loop — the hook the CLI uses to flag LM steps that
    walk the temperature outside the partition-sum table range, where the
    device path clamps silently (VERDICT.md round-1 weak item 5).
    """
    inv_se = np.asarray(1.0 / np.asarray(noise_sigma, np.float64) ** 2)
    S_a = np.asarray(S_a, np.float64)
    S_a_inv = np.linalg.inv(S_a)
    x = np.asarray(x0, np.float64)
    x_a = np.asarray(x_a, np.float64)
    in_dtype = jnp.asarray(x0).dtype    # device compute dtype
    dev = lambda v: jnp.asarray(v, in_dtype)
    lam = cfg.lm_lambda0
    history: List[Dict] = []
    start_iter = 0

    if checkpointer is not None:
        ck = checkpointer.latest()
        if ck is not None:
            x_ck = np.asarray(ck["x"], np.float64)
            if x_ck.shape != np.asarray(x0).shape:
                # A checkpoint from a DIFFERENT retrieval configuration
                # (state dimensionality changed — e.g. levels vs nodes, or
                # a different species set).  Resuming it would crash deep
                # inside unravel with a cryptic size error (found by the
                # round-5 verify run against a stale round-4 checkpoint).
                raise ValueError(
                    f"checkpoint in {checkpointer.dir!r} carries "
                    f"{x_ck.shape[0]} state parameters but this retrieval "
                    f"has {np.asarray(x0).shape[0]} — the retrieval "
                    f"configuration changed since it was written; delete "
                    f"the checkpoint directory or point run.checkpoint_dir "
                    f"elsewhere to start fresh")
            x = x_ck
            lam = float(ck["lam"])
            start_iter = int(ck["iteration"]) + 1
            history = list(ck.get("history", []))

    F = np.asarray(forward_flat(dev(x)), np.float64)
    y = np.asarray(y, np.float64)
    chi2_m, chi2_p = _chi2_terms(y, F, x, x_a, inv_se, S_a_inv)
    chi2 = float(chi2_m + chi2_p)
    converged = False
    stop_reason = "max_iter"
    n_x = x.shape[0]
    K = None
    it = start_iter

    for it in range(start_iter, cfg.max_iter):
        t0 = time.time()
        if normal_eqs is not None:
            _, H, g = normal_eqs(dev(x))
            x_try, dx, d2 = _lm_solve(x, H, g, x_a, S_a_inv, lam)
        else:
            K = jacobian(dev(x))
            x_try, dx, d2 = _lm_step(x, K, F, y, x_a, inv_se, S_a_inv, lam)
        F_try = np.asarray(forward_flat(dev(x_try)), np.float64)
        m_try, p_try = _chi2_terms(y, F_try, x_try, x_a, inv_se, S_a_inv)
        chi2_try = float(m_try + p_try)
        accepted = chi2_try < chi2

        rec = {
            "iteration": it, "lambda": float(lam), "chi2": chi2,
            "chi2_try": chi2_try, "accepted": bool(accepted),
            "d2": float(d2), "norm_dx": float(np.linalg.norm(dx)),
            "wall_s": time.time() - t0,
        }
        history.append(rec)
        if logger is not None:
            logger.log(rec)

        # Rodgers d^2 criterion: the predicted improvement is already
        # negligible — converged regardless of step acceptance (covers the
        # already-at-minimum case where no step can be "accepted").
        if float(d2) < cfg.dx2_tol * n_x:
            if accepted:
                x, F, chi2 = x_try, F_try, chi2_try
            converged = True
            stop_reason = "d2_tol"
            break

        if accepted:
            rel = (chi2 - chi2_try) / max(chi2, 1e-300)
            x, F, chi2 = x_try, F_try, chi2_try
            if state_check is not None:
                msg = state_check(x)
                if msg:
                    import warnings
                    warnings.warn(msg, stacklevel=2)
                    if logger is not None:
                        logger.log({"iteration": it, "physics_warning": msg})
            lam = max(lam * cfg.lm_down, 1e-12)
            if checkpointer is not None:
                checkpointer.save(it, x=np.asarray(x), lam=lam,
                                  history=history)
            if rel < cfg.chi2_rel_tol:
                converged = True
                stop_reason = "chi2_tol"
                break
        else:
            lam *= cfg.lm_up
            if lam > cfg.lambda_max:
                stop_reason = "lambda_max"
                break

    # Posterior covariance and averaging kernels (Rodgers 2000) — evaluated
    # at the RETRIEVED state x-hat (the loop's last K is at the pre-step x,
    # which is not the solution once a step was accepted).
    K = jacobian(dev(x))
    KtSe = np.asarray(K).T * np.asarray(inv_se)[None, :]
    H = KtSe @ np.asarray(K)
    S_hat = np.linalg.inv(H + np.asarray(S_a_inv))
    A_kernel = S_hat @ H
    chi2_m, _ = _chi2_terms(y, F, x, x_a, inv_se, S_a_inv)

    return RetrievalResult(
        x=np.asarray(x), chi2=chi2, chi2_meas=float(chi2_m),
        n_iter=it + 1, converged=converged, S_hat=S_hat, A_kernel=A_kernel,
        dof=float(np.trace(A_kernel)), history=history, K=np.asarray(K),
        stop_reason=stop_reason,
    )
