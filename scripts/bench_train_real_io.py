"""End-to-end training at multi-hundred-image scale with REAL file I/O.

Drives the actual `rcr-train` app (file scan -> PNG decode -> .pts parse
-> stacking -> host->device upload -> 4-level training -> model save) on
a directory of N distinct image files produced by make_synth_dataset.py
— the path the reference's 300-W runs exercise (rcr-train.cpp:361-520).
The tiled-device-array scale bench (bench_train_scale.py) measures the
same compute but skips the I/O; this one doesn't.

Usage: python scripts/bench_train_real_io.py [DIR] [N]
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth300"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    import glob
    if len(glob.glob(os.path.join(d, "*.png"))) < n:
        subprocess.run([sys.executable,
                        os.path.join(REPO, "scripts/make_synth_dataset.py"),
                        d, str(n)], check=True,
                       env=dict(os.environ, PALLAS_AXON_POOL_IPS="",
                                JAX_PLATFORMS="cpu"))

    from superviseddescent_tpu.apps import rcr_train

    out = f"/tmp/synth{n}_model.bin"
    t0 = time.time()
    rcr_train.main([
        "-d", d, "-o", out,
        "--roi", "512", "--patch-backend", "window",
        "--feature-chunk-size", "2048", "--sampling", "fast",
        "--num-perturbations", "10", "--seed", "0"])
    dt = time.time() - t0
    print(f"REAL-IO train ({n} files x 11 inits): {dt:.1f}s end-to-end "
          f"(incl. decode/parse/upload/save; cold adds remote compiles)",
          flush=True)
    assert os.path.exists(out)


if __name__ == "__main__":
    main()
