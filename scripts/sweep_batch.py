"""Fenced faces/s vs batch size at the bench serving config."""
import glob, os, sys
import numpy as np
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DATA = "/root/reference/examples/data/ibug_lfpw_trainset"
CFG_DIR = "/root/reference/apps/rcr/data"

def main():
    import jax, jax.numpy as jnp
    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from superviseddescent_tpu.io import read_landmarks_list_to_train, read_pts_landmarks
    from superviseddescent_tpu.models import DetectionModel, gt_facebox
    from superviseddescent_tpu.ops.patches import load_gray_image, stack_images
    from superviseddescent_tpu.utils.landmarks import to_landmark_collection, to_row
    from superviseddescent_tpu.utils.timing import measure

    model = DetectionModel.load(os.path.join(REPO, "pretrained", "rcr22_lfpw5.bin"))
    model_landmarks = read_landmarks_list_to_train(f"{CFG_DIR}/rcr_training_22.cfg")
    images, rows = [], []
    for png in sorted(glob.glob(f"{DATA}/*.png")):
        lms = read_pts_landmarks(png.replace(".png", ".pts"))
        images.append(load_gray_image(png))
        rows.append(to_row(lms.filter(model_landmarks)))
    boxes = np.stack([gt_facebox(to_landmark_collection(r, model_landmarks))
                      for r in np.stack(rows)]).astype(np.float32)
    stack, _ = stack_images(images, pad_width_to=128)

    for batch in (512, 1024, 2048, 4096):
        sel = np.arange(batch) % stack.shape[0]
        imgs = jax.device_put(jnp.asarray(stack[sel], jnp.uint8))
        bxs = jax.device_put(jnp.asarray(boxes[sel]))
        det = model.make_stepped_detector(batch, roi=512, sampling="fast",
                                          window_sampler=True, max_ied=145.0)
        dt, _ = measure(det, imgs, bxs, reps=20)
        print(f"batch {batch:5d}: {dt*1e3:7.2f} ms -> {batch/dt:8.0f} faces/s",
              flush=True)

if __name__ == "__main__":
    main()
