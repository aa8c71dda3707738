"""Synthesize the round-5 canonical EM drive dataset.

AC4-shaped synthetic volume (100x288x288 — the reference's AC4 is
100x1024x1024 but training crops (18, 260, 260) fit in 288; quality-drive
numbers are only comparable WITHIN one dataset+seed, see STATUS.md r3 #7):
train = first 80 slices, valid = last 20 (matching the reference split at
scripts_ac3ac4/data/data_provider_labeled_deep.py:128-144 /
provider_valid.py:104-110).

Usage: python docs/make_em_dataset.py [/tmp/pea/EM]
"""

import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixel_embedded_affinity_tpu.data.ac3ac4 import synthesize_volume

SEED = 20260820  # round-5 canonical drive seed


def main(folder="/tmp/pea/EM"):
    os.makedirs(folder, exist_ok=True)
    raw, label = synthesize_volume(d=100, h=288, w=288, n_cells=140,
                                   seed=SEED)
    for name, arr in (("AC4_inputs.h5", raw), ("AC4_labels.h5", label)):
        with h5py.File(os.path.join(folder, name), "w") as f:
            f.create_dataset("main", data=arr)
    print(f"wrote {folder}: raw {raw.shape} {raw.dtype}, "
          f"label {label.shape} {label.dtype}, "
          f"{len(np.unique(label))} labels")


if __name__ == "__main__":
    main(*sys.argv[1:])
