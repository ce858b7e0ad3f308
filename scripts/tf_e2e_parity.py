"""End-to-end mask + points parity vs the REAL reference pipeline.

The literal acceptance criterion (BASELINE.json): same weights -> the
reference's tiler loop (`/root/reference/predict.py:90-116`, re-enacted here
under real tf_keras) + `model_fuse.py` + `edge_3.py` (the cv2 transcription
in tests/reference_oracle.py, fuzz-proven pixel/point-exact) must equal our
Pipeline (f32) pixel-for-pixel on masks and byte-for-byte on the points.

Per-model masks may differ ONLY at pixels where TF's own class margin is
below MARGIN_TIE = 5e-3, AND at no more than MAX_DIFF_PX = 10 pixels per
scene (real divergence — wrong weights, wrong layer semantics — flips
thousands); the FUSED mask and the points must match exactly.  Why 5e-3:
the x30 classifier sharpening below amplifies the measured 1.2e-7..6e-5
cross-framework forward error by the same factor, so its tail reaches
~3-4e-3 in post-softmax margin terms — probed directly (round 4): ONE
600x696 res34 pixel with TF margin 3.418e-3 flips while the TF oracle is
bit-deterministic within a process (TF-vs-TF rerun diff: 0 px) and the
forward path was bit-identical to a run that showed zero such pixels
(threads/load shift TF's own reductions run-to-run, see tests/tf_oracle.py
oneDNN note).  A fixed 1e-3 allowance sat inside that tail and failed
spuriously.

The margin window no longer carries the parity claim alone (round-4
VERDICT item 4): before any sharpening, the probe also compares the RAW
softmax outputs of both stacks on every tile of every e2e scene and
asserts ``max|Δp| <= SOFTMAX_TOL = 2e-4`` (the measured 6e-5 tail with
margin).  That pins the forward path at the probability level directly;
the sharpened-margin allowance then only excuses amplified argmax ties,
never real probability divergence.

Usage: python scripts/tf_e2e_parity.py [scene_size [scene_h,scene_w ...]]
Defaults: one 600x600 square scene and one 600x700 non-square scene run with
fix_nonsquare_bug=False (the faithful-replication mode, `predict.py:106`).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests import tf_oracle  # noqa: E402  (sets TF_USE_LEGACY_KERAS first)

import numpy as np  # noqa: E402

MARGIN_TIE = 5e-3   # sharpened cross-framework error tail (docstring)
MAX_DIFF_PX = 10    # per scene per model; real divergence flips thousands
SOFTMAX_TOL = 2e-4  # raw (unsharpened) probability parity bound


def scene_tiles(img_rgb_f, fix_nonsquare=False):
    """The reference tiler's padded tile stack (`predict.py:98-106`),
    shared by the mask leg and the raw-softmax leg so both compare the
    exact same tensors."""
    import math

    h, w = img_rgb_f.shape[:2]
    h_num = math.ceil((h - 152) / 360)
    w_num = math.ceil((w - 152) / 360)
    new_h = h_num * 360 + 152
    new_w = w_num * 360 + 152
    tmp_img = np.zeros((max(new_h, 512), max(new_w, 512), 3), np.float32)
    tmp_img[:h, :w, :] = img_rgb_f
    inner = new_h if not fix_nonsquare else new_w
    tiles, coords = [], []
    for i in range(0, new_h - 152, 360):
        for j in range(0, inner - 152, 360):
            tiles.append(tmp_img[i : i + 512, j : j + 512, :])
            coords.append((i, j))
    return np.stack(tiles), coords, (new_h, new_w)


def reference_detection(model, img_rgb_f, fix_nonsquare=False):
    """Literal re-enactment of `predict.py:90-116` (the sliding tiler).

    ``img_rgb_f`` is the normalized float image (the reference normalizes
    before padding, `predict.py:92-93`).  Returns the {0,255} uint8 mask
    cropped to the original size plus a per-pixel MIN class margin
    |p1 - p0| over the tiles covering each pixel (used to excuse
    cross-framework argmax flips at float-noise ties).
    ``fix_nonsquare=False`` replicates the reference's inner loop running
    over new_h (`predict.py:106`).
    """
    import math

    h, w = img_rgb_f.shape[:2]
    h_num = math.ceil((h - 152) / 360)
    w_num = math.ceil((w - 152) / 360)
    new_h = h_num * 360 + 152
    new_w = w_num * 360 + 152
    tmp_img = np.zeros((max(new_h, 512), max(new_w, 512), 3), np.float32)
    pred_result = np.zeros((max(new_h, 512), max(new_w, 512)), np.int8)
    margin = np.full((max(new_h, 512), max(new_w, 512)), np.inf, np.float32)
    tmp_img[:h, :w, :] = img_rgb_f
    inner = new_h if not fix_nonsquare else new_w
    tiles, coords = [], []
    for i in range(0, new_h - 152, 360):
        for j in range(0, inner - 152, 360):
            tiles.append(tmp_img[i : i + 512, j : j + 512, :])
            coords.append((i, j))
    # batched predict is numerically identical to per-tile model.predict
    preds = model.predict(np.stack(tiles), batch_size=4, verbose=0)
    for (i, j), pred in zip(coords, preds):
        pred_result[i : i + 512, j : j + 512] += pred.argmax(-1).astype(np.int8)
        m = np.abs(pred[..., 1] - pred[..., 0])
        margin[i : i + 512, j : j + 512] = np.minimum(
            margin[i : i + 512, j : j + 512], m
        )
    mask = np.where(pred_result >= 1, 255, 0).astype(np.uint8)[:h, :w]
    return mask, margin[:h, :w]


def synthetic_scene(rng, h, w):
    """Blobby synthetic imagery so masks/polygons are non-trivial."""
    base = rng.randint(0, 256, (h // 8 + 1, w // 8 + 1, 3)).astype(np.float32)
    img = np.kron(base, np.ones((8, 8, 1)))[:h, :w]
    img += rng.randn(h, w, 3) * 8
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    shapes = [(600, 600), (600, 696)]
    if len(sys.argv) > 1:
        shapes = [tuple(map(int, s.split(","))) for s in sys.argv[1:]]

    import tempfile

    names = ["res34", "hrnet", "v3plus", "scse", "bam"]
    rng = np.random.RandomState(0)
    scenes = [synthetic_scene(rng, h, w) for h, w in shapes]
    normed = [(s[..., :] / 127.5 - 1.0).astype(np.float32) for s in scenes]
    tile_stacks = [scene_tiles(n, fix_nonsquare=False)[0] for n in normed]

    h5s, raw_h5s, models, tf_raw = {}, {}, {}, {}
    for name in names:
        import os as _os

        fd, h5s[name] = tempfile.mkstemp(suffix=f"_{name}.h5")
        _os.close(fd)
        fd, raw_h5s[name] = tempfile.mkstemp(suffix=f"_{name}_raw.h5")
        _os.close(fd)
        model = tf_oracle.build_reference_model(name)
        # raw-softmax leg (VERDICT r4 item 4): record the UNsharpened
        # probabilities on every e2e tile before any weight surgery
        model.save_weights(raw_h5s[name])
        tf_raw[name] = [
            model.predict(stack, batch_size=4, verbose=0).astype(np.float32)
            for stack in tile_stacks
        ]
        # Sharpen the classifier (x30 on the final conv) IN THE SHARED
        # WEIGHTS: at random init softmax sits near 0.5, so ulp-level
        # cross-framework float differences flip argmax on ~1/1e6 pixels and
        # break pixel-exactness spuriously.  Scaling the logits widens the
        # margins by 30x on BOTH sides — the parity claim (same weights ->
        # same masks) is unchanged.  BEFORE sharpening, re-center the class
        # decision boundary (median logit difference on a probe scene) in
        # the shared weights: random init collapses to one class nearly
        # everywhere, the 3-of-5 vote then fuses to an EMPTY mask and the
        # corner-txt comparison is vacuous (rings=0); centered masks are
        # ~50% blobs, the vote yields real components and the polygon leg
        # compares actual rings.
        probe = synthetic_scene(np.random.RandomState(123), 512, 512)
        xp = ((probe / 127.5) - 1.0).astype(np.float32)[None]
        p = np.clip(model.predict(xp, verbose=0)[0], 1e-9, 1.0)
        m = float(np.median(np.log(p[..., 1]) - np.log(p[..., 0])))
        for layer in reversed(model.layers):
            ws = layer.get_weights()
            if ws:
                kernel, bias = ws
                bias = bias - np.array([0.0, m], bias.dtype)
                layer.set_weights([kernel * 30.0, bias * 30.0])
                break
        model.save_weights(h5s[name])
        models[name] = model
        print(f"built reference {name}")

    # --- reference path: TF tiler loop + cv2-transcription fusion/edges ----
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests"))
    import reference_oracle as RO

    ref_results = []
    for scene, norm in zip(scenes, normed):
        # the reference normalizes in numpy f64 and TF casts at the graph
        # boundary (`predict.py:93`); f32 arithmetic here would be 1 ulp off
        # for half the uint8 range and flip near-tie argmax pixels
        per_model, margins = {}, {}
        for n in names:
            per_model[n], margins[n] = reference_detection(
                models[n], norm, fix_nonsquare=False
            )
        # fusion consumes masks in glob (alphabetical) order (model_fuse.py:278)
        fused = RO.model_confuse([per_model[n] for n in sorted(names)])
        points, _height = RO.detection_points(fused)
        ref_results.append((per_model, margins, fused, points))
        print(f"reference pipeline done for scene {scene.shape[:2]}")

    # --- our path --------------------------------------------------------
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from building_detection_tpu.core.config import Config, TilerConfig
    from building_detection_tpu.infer.pipeline import Pipeline
    from building_detection_tpu.utils.io import points_dict

    cfg = Config(tiler=TilerConfig(fix_nonsquare_bug=False))
    pipe = Pipeline(
        weights=h5s, cfg=cfg, compute_dtype=jnp.float32, batch_tiles=8
    )
    ok = True

    # --- raw-softmax forward parity (no sharpening, no margin window) ------
    from building_detection_tpu.core import module as M
    from building_detection_tpu.models.registry import MODEL_REGISTRY, init_model
    from building_detection_tpu.train.checkpoint import import_h5_weights

    for name in names:
        p0, s0 = init_model(name, jax.random.key(0), (1, 512, 512, 3))
        params, state, _ = import_h5_weights(raw_h5s[name], p0, s0)
        fwd = jax.jit(
            lambda p, s, x, fn=MODEL_REGISTRY[name]: M.apply(
                fn, p, s, x, compute_dtype=jnp.float32
            )[0]
        )
        worst = 0.0
        for stack, tf_probs in zip(tile_stacks, tf_raw[name]):
            ours = np.concatenate([
                np.asarray(fwd(params, state, jnp.asarray(stack[i : i + 4])))
                for i in range(0, len(stack), 4)
            ])
            worst = max(worst, float(np.max(np.abs(ours - tf_probs))))
        passed = worst <= SOFTMAX_TOL
        print(f"raw softmax {name}: max|dp| = {worst:.3e} "
              f"({'PASS' if passed else 'FAIL'} tol {SOFTMAX_TOL:g})")
        ok &= passed
    for scene, (ref_masks, ref_margins, ref_fused, ref_points) in zip(
        scenes, ref_results
    ):
        res = pipe.predict_image(scene)
        for n in names:
            diff_px = res.masks[n] != ref_masks[n]
            diff = int(diff_px.sum())
            # argmax flips where TF's own (sharpened) class margin is below
            # the amplified cross-framework float error are ties, not
            # divergence — see module docstring for the 5e-3 calibration;
            # the hard count cap keeps the allowance from masking real
            # divergence, which flips thousands of pixels
            real = int((diff_px & (ref_margins[n] > MARGIN_TIE)).sum())
            print(
                f"{scene.shape[:2]} {n}: mask diff px = {diff} "
                f"(above-margin: {real})"
            )
            ok &= real == 0 and diff <= MAX_DIFF_PX
        fdiff = int((res.fused != ref_fused).sum())
        print(f"{scene.shape[:2]} fused: diff px = {fdiff}")
        ok &= fdiff == 0
        ours = points_dict(res.corners)
        theirs = {
            str(i): "".join(f"{x},{y} " for x, y in zip(xs, ys))
            for i, (xs, ys) in enumerate(ref_points)
        }
        same = ours == theirs
        if not same:
            # float (minAreaRect-fallback) rings may be a cv2 equal-area
            # caliper-tie case — one shared policy with the fuzzes
            from pipeline_fuzz import _rings_match_ulp

            same = _rings_match_ulp(res.corners, ref_points)
            if same:
                print(f"{scene.shape[:2]} points: caliper-tie ulp case accepted")
        print(f"{scene.shape[:2]} points: rings={len(ours)} identical={same}")
        ok &= same
        ok &= len(ours) > 0  # the polygon leg must compare REAL rings
    print("E2E PARITY:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
