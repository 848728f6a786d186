"""Sweep the remaining training-augmentation levers on the heldout60
leave-one-identity-out protocol (VERDICT r4 item 5): the reference
hardcodes num_perturbations=10 and sigma_translation/scale=0.04
(rcr-train.cpp:130-146, 421-431) — measure whether those are actually
optimal for this model class, and whether the "more derived training
data keeps helping" trend (PERF_NOTES heldout tables) continues at a
120-image synthetic set.

Each configuration is one full leave-one-identity-out pass (5 folds,
mirror-augmented training) through bench.bench_heldout60; the compiled
train/eval programs are shared across folds and cached per (shape)
class, so only genuinely new shapes compile.

Usage: python scripts/sweep_train_levers.py [perturb|sigma|scale120|all]
       (results -> docs/PERF_NOTES.md; keep/revert decision goes into
        RcrTrainConfig defaults)
"""
import os
import sys
import time

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

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rows = []

    def run(tag, **kw):
        t0 = time.time()
        m, worst = bench.bench_heldout60(model_landmarks, right_ids,
                                         left_ids, mean, **kw)
        rows.append((tag, m, worst, time.time() - t0))
        print(f"{tag:34s} mean {m:.4f} worst {worst:.4f} "
              f"({time.time()-t0:.0f}s)", flush=True)

    if which in ("perturb", "all"):
        # reference hardcodes 10 (rcr-train.cpp:421-431); each value
        # changes the augmented sample count -> its own train compile
        for p in (5, 10, 15, 20):
            run(f"num_perturbations={p}", num_perturbations=p)
    if which in ("sigma", "all"):
        # translation/scale jitter around the reference's 0.04
        # (rcr-train.cpp:130-146); sample count unchanged -> all four
        # reuse the baseline's compiled programs
        for s in (0.02, 0.04, 0.06, 0.08):
            run(f"sigma_t=sigma_s={s}", sigma_translation=s, sigma_scale=s)
    if which in ("scale120", "all"):
        # scaled synthetic set: does more derived data keep helping?
        run("n=120 (baseline cfg)", n=120)

    print("\nsummary (heldout IOD err, leave-one-identity-out, mirror):")
    for tag, m, worst, dt in rows:
        print(f"  {tag:34s} mean {m:.4f}  worst {worst:.4f}")


if __name__ == "__main__":
    main()
