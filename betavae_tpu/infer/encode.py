"""Batch latent encoding CLI: dataset → μ/logσ² arrays + embeddings CSV.

Capability parity with reference ``src/inference/encode.py:21-64``: encodes
train and test splits, writes ``{train,test}_latents_mu.npy``,
``..._logvar.npy`` and ``..._embeddings.csv`` (columns path, label, z0..zK)
into the tables dir.  Encoding is batched jit on device; only the final
arrays cross to host.
"""

from __future__ import annotations

import csv
import os

import numpy as np

from ..config import get_config
from ..data.dataset import ArrayDataset, build_datasets
from ..eval.run_evaluation import load_model


def encode_dataset(model, variables, ds: ArrayDataset):
    cfg = get_config()
    bs = int(cfg.training.batch_size)
    # dispatch all batches, pull to host after — lets encodes pipeline
    # instead of paying the relay round-trip per batch
    pending = []
    for s in range(0, len(ds), bs):
        e = min(s + bs, len(ds))
        x = ds.images[s:e].astype(np.float32) / 255.0
        if e - s < bs:  # pad the ragged tail: one compile per program
            x = np.concatenate(
                [x, np.repeat(x[-1:], bs - (e - s), axis=0)], axis=0)
        mu, logvar = model.encode(variables, x)
        pending.append((mu, logvar, e - s))
    if pending:
        Z = np.concatenate([np.asarray(mu)[:n] for mu, _, n in pending])
        LV = np.concatenate([np.asarray(lv)[:n] for _, lv, n in pending])
    else:
        Z = np.zeros((0, model.latent_dim))
        LV = np.zeros_like(Z)
    return Z, LV, list(ds.labels), list(ds.paths)


def write_embeddings(Z, LV, labels, paths, prefix: str) -> str:
    cfg = get_config()
    out_dir = cfg.paths.tables_dir
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, f"{prefix}_mu.npy"), Z)
    np.save(os.path.join(out_dir, f"{prefix}_logvar.npy"), LV)
    csv_path = os.path.join(out_dir, f"{prefix}_embeddings.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["path", "label"] + [f"z{i}" for i in range(Z.shape[1])])
        for i in range(Z.shape[0]):
            w.writerow([paths[i], labels[i]] + list(Z[i]))
    return csv_path


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="Encode splits to latents")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--weights", type=str, default="best")
    args = parser.parse_args(argv)
    if args.config:
        os.environ["CONFIG_PATH"] = args.config

    get_config()
    train_ds, test_ds = build_datasets()
    model, variables = load_model(args.weights)
    Zt, LVt, Lt, Pt = encode_dataset(model, variables, train_ds)
    write_embeddings(Zt, LVt, Lt, Pt, "train_latents")
    Zv, LVv, Lv, Pv = encode_dataset(model, variables, test_ds)
    write_embeddings(Zv, LVv, Lv, Pv, "test_latents")


if __name__ == "__main__":
    main()
