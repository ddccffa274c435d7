"""API-level tests: Carver lifecycle, carve(), retargeter, CLI, batch mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dct_carver_tpu.api import carve
from dct_carver_tpu.models.carver import Carver
from dct_carver_tpu.models.retarget import InteractiveRetargeter
from dct_carver_tpu.oracle import reference as oracle
from dct_carver_tpu.utils.config import CarverConfig


def test_carve_remove(make_image):
    img = make_image(32, 40, c=3)
    res = carve(img, -6, output_seams=True, output_energy=True)
    assert res.image.shape == (32, 34, 3)
    assert res.visibility_map.shape == (32, 40)
    assert res.energy_image.shape == (32, 40)
    assert res.energy_image.dtype == np.uint8
    for k in range(1, 7):
        assert ((res.visibility_map == k).sum(axis=1) == 1).all()


def test_carve_insert(make_image):
    img = make_image(24, 30, c=3)
    res = carve(img, 5)
    assert res.image.shape == (24, 35, 3)


def test_carve_vertically(make_image):
    img = make_image(40, 32, c=3)
    res = carve(img, -8, vertically=True, output_seams=True)
    assert res.image.shape == (32, 32, 3)
    assert res.visibility_map.shape == (40, 32)
    # one removed pixel per COLUMN per seam
    for k in range(1, 9):
        assert ((res.visibility_map == k).sum(axis=0) == 1).all()


def test_carve_zero_seams(make_image):
    img = make_image(16, 16)
    res = carve(img, 0, output_seams=True)
    np.testing.assert_array_equal(res.image, img)
    assert res.visibility_map.sum() == 0


def test_carver_resize_bidirectional(make_image):
    """Config 3 shape: vertical + horizontal passes (width first, liblqr order)."""
    img = make_image(40, 48, c=3)
    res = Carver(img, CarverConfig()).resize(44, 36)
    assert res.image.shape == (36, 44, 3)


def test_carver_energy_image(make_image):
    img = make_image(24, 24, c=3)
    e = Carver(img, CarverConfig(blocksize=4)).energy_image()
    assert e.shape == (24, 24) and e.dtype == np.uint8
    ref = oracle.normalize_to_u8(
        oracle.energy_map(oracle.luma_bt709(img), 4, 0.0, 1.0)
    )
    # f32 vs f64 rounding can move a value by 1 gray level
    assert np.abs(e.astype(int) - ref.astype(int)).max() <= 1


def test_interactive_retargeter_matches_direct(make_image):
    """Sliding to width w0-s must equal carving s seams directly (nested-seam
    property: the first s seams of an N-seam precompute are the s-seam carve)."""
    img = make_image(32, 40, c=3)
    cfg = CarverConfig()
    rt = InteractiveRetargeter(img, max_seams=8, config=cfg)
    for s in (1, 4, 8):
        direct = carve(img, -s)
        np.testing.assert_array_equal(rt.at_width(40 - s), direct.image)
    np.testing.assert_array_equal(rt.at_width(40), img)
    enlarged = rt.at_width(43)
    assert enlarged.shape == (32, 43, 3)


def test_cli_roundtrip(tmp_path, make_image):
    from dct_carver_tpu.cli import main
    from dct_carver_tpu.utils.image import save_ppm, load_ppm

    img = make_image(24, 32, c=3)
    inp = tmp_path / "in.ppm"
    outp = tmp_path / "out.ppm"
    seams = tmp_path / "seams.ppm"
    save_ppm(str(inp), img)
    rc = main(["carve", str(inp), str(outp), "--seams", "-4",
               "--output-seams", str(seams)])
    assert rc == 0
    out = load_ppm(str(outp))
    assert out.shape == (24, 28, 3)
    overlay = load_ppm(str(seams))
    assert overlay.shape == (24, 32, 3)
    # overlay paints seam pixels pure green (R=B=0, G>0): exactly 4 per row
    pure_green = (overlay[..., 0] == 0) & (overlay[..., 2] == 0) & (overlay[..., 1] > 0)
    assert (pure_green.sum(axis=1) == 4).all()


def test_batch_carve_multidevice(make_image):
    from dct_carver_tpu.parallel.mesh import make_mesh, carve_batch

    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    mesh = make_mesh(8)
    imgs = np.stack([make_image(24, 32, c=3) for _ in range(16)])
    out, vmaps = carve_batch(imgs, 3, mesh=mesh)
    assert out.shape == (16, 24, 29, 3)
    # each image must match the single-image path
    single = carve(imgs[0], -3)
    np.testing.assert_array_equal(np.asarray(out[0]), single.image)


def test_resize_canvas_false(make_image):
    """resize_canvas=FALSE analog (src/main.h:19): the retargeted layer sits
    top-left on the ORIGINAL canvas; removals zero-fill, enlargements crop."""
    img = make_image(24, 32, c=3)
    ref = carve(img, -6)
    res = carve(img, -6, resize_canvas=False)
    assert res.image.shape == img.shape
    np.testing.assert_array_equal(res.image[:, :26], ref.image)
    assert (res.image[:, 26:] == 0).all()
    grown = carve(img, 5, resize_canvas=False)
    gref = carve(img, 5)
    assert grown.image.shape == img.shape
    np.testing.assert_array_equal(grown.image, gref.image[:, :32])


def test_api_parallel_spatial_matches_single(make_image):
    """The parallel='spatial' route of the top-level API must produce the
    IDENTICAL visibility map and image as the default single-device route
    (the flagship mesh capability behind the same front door as
    src/render.c:327's render())."""
    img = make_image(24, 64, c=3)
    ref = carve(img, -5, output_seams=True, output_energy=True)
    got = carve(img, -5, output_seams=True, output_energy=True,
                parallel="spatial")
    np.testing.assert_array_equal(got.visibility_map, ref.visibility_map)
    np.testing.assert_array_equal(got.image, ref.image)
    np.testing.assert_array_equal(got.energy_image, ref.energy_image)
    # enlargement and the vertical axis route too
    egot = carve(img, 4, parallel="spatial")
    eref = carve(img, 4)
    np.testing.assert_array_equal(egot.image, eref.image)
    vgot = carve(img, -3, vertically=True, parallel="spatial",
                 output_seams=True)
    vref = carve(img, -3, vertically=True, output_seams=True)
    np.testing.assert_array_equal(vgot.visibility_map, vref.visibility_map)
    np.testing.assert_array_equal(vgot.image, vref.image)


def test_api_parallel_batch_stack(make_image):
    """parallel='batch' (and 'auto' with a 4-D input) routes a (B, H, W, C)
    stack through the data-parallel mesh; every image matches the
    single-image carve."""
    imgs = np.stack([make_image(16, 24, c=3) for _ in range(4)])
    res = carve(imgs, -3, parallel="batch", output_seams=True)
    assert res.image.shape == (4, 16, 21, 3)
    assert res.visibility_map.shape == (4, 16, 24)
    single = carve(imgs[2], -3, output_seams=True)
    np.testing.assert_array_equal(res.image[2], single.image)
    np.testing.assert_array_equal(res.visibility_map[2],
                                  single.visibility_map)
    auto = carve(imgs, -3, parallel="auto")
    np.testing.assert_array_equal(auto.image, res.image)
    # enlargement of a stack
    eres = carve(imgs, 2, parallel="batch")
    esingle = carve(imgs[1], 2)
    np.testing.assert_array_equal(eres.image[1], esingle.image)
    # a plain (H, W) image is not a stack ((H, W, C) IS one — a B-image
    # gray stack and an RGB image are indistinguishable by shape)
    with pytest.raises(ValueError, match="stack"):
        carve(imgs[0, ..., 0], -3, parallel="batch")


def test_batch_route_honors_all_knobs(make_image):
    """The batch route must honor every knob like the single-image route:
    output_energy, resize_canvas, tie (per-image identical results)."""
    imgs = np.stack([make_image(16, 24, c=3) for _ in range(3)])
    res = carve(imgs, -3, parallel="batch", output_energy=True,
                resize_canvas=False, tie="rightmost")
    single = carve(imgs[1], -3, output_energy=True, resize_canvas=False,
                   tie="rightmost")
    assert res.image.shape == imgs.shape  # canvas kept
    np.testing.assert_array_equal(res.image[1], single.image)
    np.testing.assert_array_equal(res.energy_image[1], single.energy_image)


def test_retargeter_honors_tie_and_energy(make_image):
    """The interactive precompute path must honor the tie and energy knobs
    (they silently defaulted before round 5's review)."""
    img = np.full((12, 32, 3), 99, np.uint8)  # all-ties image
    rt_l = InteractiveRetargeter(img, 2, tie="leftmost")
    rt_r = InteractiveRetargeter(img, 2, tie="rightmost")
    lcols = np.argwhere(rt_l.visibility_map == 1)[:, 1]
    rcols = np.argwhere(rt_r.visibility_map == 1)[:, 1]
    assert (lcols == 0).all() and (rcols == 31).all()
    img2 = make_image(16, 24, c=3)
    rt_g = InteractiveRetargeter(img2, 3, energy="grad_norm")
    ref = carve(img2, -3, energy="grad_norm", output_seams=True)
    got = rt_g.at_width(21)
    np.testing.assert_array_equal(got, ref.image)


def test_cli_spatial_flag(tmp_path, make_image):
    """dct-carver carve --spatial must produce the identical output to the
    single-device CLI run."""
    from dct_carver_tpu.cli import main
    from dct_carver_tpu.utils.image import save_ppm, load_ppm

    img = make_image(16, 64, c=3)
    inp = tmp_path / "in.ppm"
    save_ppm(str(inp), img)
    a, b = tmp_path / "a.ppm", tmp_path / "b.ppm"
    assert main(["carve", str(inp), str(a), "--seams", "-4"]) == 0
    assert main(["carve", str(inp), str(b), "--seams", "-4",
                 "--spatial"]) == 0
    np.testing.assert_array_equal(load_ppm(str(a)), load_ppm(str(b)))


def test_graft_entry():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    vmap, energy = jax.jit(fn)(*args)
    assert vmap.shape == (256, 256)
    ge.dryrun_multichip(8)


def test_cli_interactive_mode(tmp_path, make_image):
    from dct_carver_tpu.cli import main
    from dct_carver_tpu.utils.image import save_ppm, load_ppm

    img = make_image(20, 40, c=3)
    inp = tmp_path / "in.ppm"
    save_ppm(str(inp), img)
    pattern = str(tmp_path / "out_{w}.ppm")
    rc = main(["interactive", str(inp), pattern, "--max-seams", "6",
               "--widths", "34", "38", "40"])
    assert rc == 0
    for w in (34, 38, 40):
        out = load_ppm(pattern.format(w=w))
        assert out.shape == (20, w, 3)
    # width 40 (no change) round-trips the original image
    np.testing.assert_array_equal(load_ppm(pattern.format(w=40)), img)


def test_cli_last_vals(tmp_path, make_image, monkeypatch):
    from dct_carver_tpu.cli import main
    from dct_carver_tpu.utils.image import save_ppm, load_ppm

    monkeypatch.setenv("DCT_CARVER_STATE_DIR", str(tmp_path / "state"))
    img = make_image(20, 30, c=3)
    inp = tmp_path / "in.ppm"
    save_ppm(str(inp), img)
    out1 = tmp_path / "o1.ppm"
    out2 = tmp_path / "o2.ppm"
    rc = main(["carve", str(inp), str(out1), "--seams", "-5",
               "--blocksize", "4"])
    assert rc == 0
    # rerun with the saved settings: no --seams/--blocksize needed
    rc = main(["carve", str(inp), str(out2), "--last-vals"])
    assert rc == 0
    np.testing.assert_array_equal(load_ppm(str(out1)), load_ppm(str(out2)))


def test_cli_last_vals_without_history(tmp_path, make_image, monkeypatch):
    from dct_carver_tpu.cli import main
    from dct_carver_tpu.utils.image import save_ppm

    monkeypatch.setenv("DCT_CARVER_STATE_DIR", str(tmp_path / "empty"))
    inp = tmp_path / "in.ppm"
    save_ppm(str(inp), make_image(10, 12, c=3))
    assert main(["carve", str(inp), str(tmp_path / "o.ppm"),
                 "--last-vals"]) == 1
    assert main(["carve", str(inp), str(tmp_path / "o.ppm")]) == 1  # no seams


def test_cli_checkpoint_resume(tmp_path, make_image, monkeypatch):
    from dct_carver_tpu.cli import main
    from dct_carver_tpu.utils.image import save_ppm, load_ppm

    monkeypatch.setenv("DCT_CARVER_STATE_DIR", str(tmp_path / "state"))
    img = make_image(24, 48, c=3)
    inp = tmp_path / "in.ppm"
    save_ppm(str(inp), img)
    ref = tmp_path / "ref.ppm"
    ckpt = tmp_path / "ck.npz"
    out = tmp_path / "out.ppm"
    assert main(["carve", str(inp), str(ref), "--seams", "-8"]) == 0
    # checkpointed run writes snapshots; a resumed run completes identically
    assert main(["carve", str(inp), str(out), "--seams", "-8",
                 "--checkpoint", str(ckpt), "--checkpoint-every", "3"]) == 0
    np.testing.assert_array_equal(load_ppm(str(ref)), load_ppm(str(out)))
    assert ckpt.exists()


def test_carver_progress_hook(make_image):
    from dct_carver_tpu.models.carver import Carver

    class Rec:
        def __init__(self):
            self.events = []
        def init(self, m):
            self.events.append(("init", m))
        def update(self, f):
            self.events.append(("update", f))
        def end(self):
            self.events.append(("end",))

    img = make_image(20, 30, c=3)
    rec = Rec()
    res = Carver(img, progress=rec).resize(25, 20)
    assert res.image.shape == (20, 25, 3)
    kinds = [e[0] for e in rec.events]
    assert kinds[0] == "init" and kinds[-1] == "end" and "update" in kinds
    assert rec.events[-2] == ("update", 1.0)
