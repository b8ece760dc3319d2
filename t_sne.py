"""t-SNE scatter of dumped degradation features (reference root t_sne.py).

L2-normalises each feature row, runs sklearn TSNE(2), and scatter-plots by
degradation label (matplotlib; seaborn used when available).

Usage::

    python t_sne.py --features knns/run/lr_features_6.npy --labels knns/run/lr_labels.npy \
        --out knns/t_sne.png
"""

from __future__ import annotations

import argparse

import numpy as np

DEGRADATION_NAMES = {1: "haze", 2: "motion-blur", 3: "noise", 4: "rain", 5: "low_light"}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--features", default="knns/run/lr_features_6.npy")
    parser.add_argument("--labels", default="knns/run/lr_labels.npy")
    parser.add_argument("--out", default="knns/t_sne.png")
    parser.add_argument("--iters", type=int, default=2000)
    parser.add_argument("--perplexity", type=float, default=30.0)
    args = parser.parse_args()

    from sklearn.manifold import TSNE

    data = np.load(args.features).astype(np.float64)
    norms = np.linalg.norm(data, axis=1, keepdims=True)
    data = data / np.maximum(norms, 1e-12)
    label = np.load(args.labels)
    print(label.shape, data.shape)

    print("Computing t-SNE embedding")
    tsne = TSNE(n_components=2, verbose=1, max_iter=args.iters, perplexity=min(args.perplexity, max(1.0, data.shape[0] - 1.0)))
    tsne_results = tsne.fit_transform(data)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(16, 10))
    plt.xticks([])
    plt.yticks([])
    names = np.vectorize(lambda v: DEGRADATION_NAMES.get(int(v), str(v)))(label)
    try:
        import pandas as pd
        import seaborn as sns

        df = pd.DataFrame({"tsne-2d-one": tsne_results[:, 0], "tsne-2d-two": tsne_results[:, 1], "degradation": names})
        sns.scatterplot(
            x="tsne-2d-one", y="tsne-2d-two", hue="degradation",
            palette=sns.color_palette("hls", 10), data=df, legend="full", s=128,
        )
    except ImportError:
        for name in np.unique(names):
            m = names == name
            plt.scatter(tsne_results[m, 0], tsne_results[m, 1], label=name, s=32)
        plt.legend()
    plt.savefig(args.out, bbox_inches="tight", dpi=300, pad_inches=0.0)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
