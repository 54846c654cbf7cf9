"""Activation-function study: how close is gelu to a scaled swish?

Script form of the reference's tools/act.ipynb: the engine supports silu and
gelu (reference model.h act_type); this tool quantifies the classic
gelu(x) ~= x * sigmoid(1.702 x) approximation and the tanh-approximate gelu
the engine uses, over a representative activation range.

Usage: python tools/act.py
"""

from __future__ import annotations

import numpy as np


def silu(x, beta=1.0):
    return x / (1.0 + np.exp(-beta * x))


def gelu_exact(x):
    from math import sqrt
    from numpy import vectorize
    try:
        from scipy.special import erf
        return 0.5 * x * (1.0 + erf(x / sqrt(2.0)))
    except ImportError:
        # erf via the Abramowitz-Stegun rational approximation
        def erf_a(v):
            t = 1.0 / (1.0 + 0.3275911 * abs(v))
            y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741)
                        * t - 0.284496736) * t + 0.254829592) * t * np.exp(-v * v)
            return y if v >= 0 else -y
        return 0.5 * x * (1.0 + vectorize(erf_a)(x / sqrt(2.0)))


def gelu_tanh(x):
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def main():
    x = np.linspace(-6, 6, 4001)
    g = gelu_exact(x)

    # fit the swish beta that best matches exact gelu (reference fit: 1.702)
    betas = np.linspace(1.5, 2.0, 501)
    errs = [np.max(np.abs(silu(x, b) - g)) for b in betas]
    best = betas[int(np.argmin(errs))]
    print(f"best swish beta ~= {best:.3f} "
          f"(max |err| {min(errs):.4f}; literature value 1.702)")

    print(f"tanh-approx gelu max |err| vs exact: "
          f"{np.max(np.abs(gelu_tanh(x) - g)):.2e} "
          f"(the engine's act_type=gelu uses the tanh approximation)")
    print(f"silu(beta=1) vs gelu max |err|: {np.max(np.abs(silu(x) - g)):.3f} "
          f"(why silu checkpoints cannot run with act_type=gelu)")


if __name__ == "__main__":
    main()
