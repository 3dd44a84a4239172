#!/usr/bin/env python
"""Plot the Bayesian cross-entropy loss surface vs predicted class variance
(ref tools/cls_uncertainty_vis.py: loss-curve sanity plots for the
aleatoric classification loss)."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="cls_uncertainty_vis.png", type=str)
    p.add_argument("--num_sample", default=200, type=int)
    args = p.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import jax
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    from faster_rcnn_pytorch_multimodal_tpu.ops.losses import bayesian_cross_entropy

    rng = jax.random.PRNGKey(0)
    margins = np.linspace(-4, 4, 9)  # logit margin of the true class
    sigmas = np.linspace(0.01, 4.0, 60)

    fig, ax = plt.subplots(figsize=(7, 5))
    for m in margins:
        losses = []
        for s in sigmas:
            logits = jnp.asarray([[m, 0.0]])
            var = jnp.full((1, 2), s**2)
            loss, _ = bayesian_cross_entropy(
                logits, var, jnp.asarray([0]), args.num_sample, rng
            )
            losses.append(float(loss))
        ax.plot(sigmas, losses, label=f"margin {m:+.1f}")
    ax.set_xlabel("predicted logit std (sqrt aleatoric variance)")
    ax.set_ylabel("bayesian cross-entropy")
    ax.set_title("Aleatoric CE: variance attenuates confident mistakes")
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
