"""5-fold KNN separability probe on dumped features (reference root knn.py).

Usage::

    python knn.py --features knns/run/lr_features_6.npy --labels knns/run/lr_labels.npy
"""

from __future__ import annotations

import argparse

import numpy as np
from sklearn.metrics import classification_report
from sklearn.model_selection import train_test_split
from sklearn.neighbors import KNeighborsClassifier


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--features", default="knns/run/lr_features_6.npy")
    parser.add_argument("--labels", default="knns/run/lr_labels.npy")
    parser.add_argument("--neighbors", type=int, default=5)
    args = parser.parse_args()

    data = np.load(args.features)
    label = np.load(args.labels)
    print(data.shape, label.shape)

    randoms = [0, 223, 929, 1234, 10086]  # same splits as the reference
    for seed in randoms:
        x_train, x_test, y_train, y_test = train_test_split(data, label, test_size=0.33, random_state=seed)
        neigh = KNeighborsClassifier(n_neighbors=args.neighbors)
        neigh.fit(x_train, y_train)
        y_pred = neigh.predict(x_test)
        print(classification_report(y_test, y_pred))


if __name__ == "__main__":
    main()
