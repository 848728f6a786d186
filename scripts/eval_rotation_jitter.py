"""Measure the in-plane rotation-jitter augmentation lever on the
leave-one-identity-out synthetic protocol (VERDICT r4 item 4: try the
next measured accuracy lever beyond the reference's translation/scale
sigma=0.04 and keep or revert with numbers).

The synthetic faces carry +-12 deg similarity warps
(make_synth_dataset.py) while gt_facebox initialisation is axis-aligned,
so the cascade must learn to de-rotate; training initialisations rotated
by theta ~ N(0, sigma_rot) teach exactly that correction
(models/rcr_training.py::augment_initialisations).

Usage: python scripts/eval_rotation_jitter.py [sigma_rot ...]
       (default sweep: 0.0 0.05 0.1 0.15 rad; results -> PERF_NOTES.md)
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import bench
    from superviseddescent_tpu.io import read_landmarks_list_to_train

    model_landmarks = read_landmarks_list_to_train(
        f"{bench.CFG_DIR}/rcr_training_22.cfg")
    right_ids, left_ids, mean = bench.load_train_meta(model_landmarks)

    sigmas = [float(a) for a in sys.argv[1:]] or [0.0, 0.05, 0.1, 0.15]
    results = {}
    for s in sigmas:
        m, worst = bench.bench_heldout60(
            model_landmarks, right_ids, left_ids, mean,
            sigma_rotation=s)
        results[s] = (m, worst)
        print(f"sigma_rot={s}: mean {m:.4f} worst {worst:.4f}", flush=True)
    print("\nsummary:")
    for s, (m, worst) in results.items():
        print(f"  sigma_rot={s:5.2f}  mean {m:.4f}  worst {worst:.4f}")


if __name__ == "__main__":
    main()
