"""End-to-end tests for the web UI (ui/server.py) — the GTK-dialog analog.

Drives the real HTTP server over a socket: meta, live energy preview,
precompute-once / slide-many resize, and a full carve with both output
checkboxes — the reference dialog surfaces of src/interface.c.
"""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from dct_carver_tpu.ui.server import CarverApp, make_server


def _png_to_array(data: bytes) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)))


@pytest.fixture(scope="module")
def server():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    srv = make_server(CarverApp(img))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address
    yield f"http://{host}:{port}", img
    srv.shutdown()
    srv.server_close()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=60) as r:
        return r.status, r.read()


def _post(base, path, obj):
    req = urllib.request.Request(
        base + path, data=json.dumps(obj).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_meta_and_image(server):
    base, img = server
    status, body = _get(base, "/api/meta")
    assert status == 200
    meta = json.loads(body)
    assert meta["width"] == 56 and meta["height"] == 40
    assert meta["blocksizes"] == [2, 4, 8, 16]
    assert meta["max_seams_w"] == 55  # +-(dim-1), interface.c:374-385
    assert 0.0 <= meta["defaults"]["slider"] <= 1.0

    status, body = _get(base, "/image.png")
    assert status == 200
    np.testing.assert_array_equal(_png_to_array(body), img)


def test_energy_preview_endpoint(server):
    base, img = server
    status, body = _get(base, "/preview.png?blocksize=4&slider=0.5")
    assert status == 200
    e = _png_to_array(body)
    assert e.shape == (40, 56)
    # matches the Carver preview path exactly
    from dct_carver_tpu.models.carver import Carver
    from dct_carver_tpu.utils.config import CarverConfig

    ref = Carver(img, CarverConfig(blocksize=4, edges=0.5, textures=0.5))
    np.testing.assert_array_equal(e, ref.energy_preview())


def test_resize_requires_precompute_then_slides(server):
    base, img = server
    # 409 before precompute (LookupError path)
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(base, "/resize.png?delta=-3")
    assert exc.value.code == 409

    status, r = _post(base, "/api/precompute",
                      {"max_seams": 6, "blocksize": 8, "slider": 1.0,
                       "vertical": False})
    assert status == 200 and r["ok"] and r["max_seams"] == 6

    status, body = _get(base, "/resize.png?delta=-4")
    assert status == 200
    out = _png_to_array(body)
    assert out.shape == (40, 52, 3)
    # delta beyond the precomputed range is clamped, like the GTK slider
    status, body = _get(base, "/resize.png?delta=-100")
    assert _png_to_array(body).shape == (40, 50, 3)
    status, body = _get(base, "/resize.png?delta=3")
    assert _png_to_array(body).shape == (40, 59, 3)


def test_carve_with_outputs(server):
    base, img = server
    status, r = _post(base, "/api/carve", {
        "seams_number": -5, "blocksize": 8, "slider": 1.0,
        "vertically": False, "output_energy": True, "output_seams": True,
    })
    assert status == 200 and r["ok"]
    assert (r["width"], r["height"]) == (51, 40)
    assert set(r["urls"]) == {"result", "energy", "seams"}

    _, body = _get(base, r["urls"]["result"])
    assert _png_to_array(body).shape == (40, 51, 3)
    _, body = _get(base, r["urls"]["energy"])
    assert _png_to_array(body).shape == (40, 56)
    _, body = _get(base, r["urls"]["seams"])
    seams = _png_to_array(body)
    assert seams.shape == (40, 56, 3)
    # seam pixels are pure green-channel marks (render.c:222-235 semantics)
    marked = (seams[..., 0] == 0) & (seams[..., 2] == 0) & (seams[..., 1] > 0)
    assert marked.sum() == 5 * 40

    # carve persisted last-vals (gimp_set_data analog): meta defaults update
    _, body = _get(base, "/api/meta")
    assert json.loads(body)["defaults"]["seams_number"] == -5


def test_vertical_carve(server):
    base, img = server
    status, r = _post(base, "/api/carve", {
        "seams_number": -3, "blocksize": 8, "slider": 0.7,
        "vertically": True,
    })
    assert status == 200 and (r["width"], r["height"]) == (56, 37)


def test_root_serves_html(server):
    base, _ = server
    status, body = _get(base, "/")
    assert status == 200 and b"dct-carver" in body and b"blocksize" in body


def test_carve_clamps_excessive_seams(server):
    """The ±(dim-1) spinbutton clamp (interface.c:374-385) is enforced
    SERVER-side: an absurd request carves at most dim-1 seams."""
    base, img = server
    status, r = _post(base, "/api/carve", {
        "seams_number": -10**6, "blocksize": 8, "slider": 1.0,
    })
    assert status == 200 and r["ok"]
    assert r["seams"] == -(56 - 1)
    assert r["width"] == 1


def test_slider_coupling_server_side(server):
    """The single edges<->textures slider (interface.c:631-639: textures=s,
    edges=1-s) is applied server-side: the persisted last-vals after a carve
    carry the coupled pair."""
    base, img = server
    status, r = _post(base, "/api/carve", {
        "seams_number": -2, "blocksize": 4, "slider": 0.25,
    })
    assert status == 200 and r["ok"]
    from dct_carver_tpu.utils.settings import load_last_vals

    vals = load_last_vals()
    assert vals["textures"] == 0.25
    assert vals["edges"] == 0.75


def test_resize_clamps_delta(server):
    """/resize.png clamps delta to the precomputed ±max_seams range."""
    base, img = server
    status, r = _post(base, "/api/precompute", {
        "max_seams": 4, "blocksize": 8, "slider": 1.0, "vertical": False,
    })
    assert status == 200 and r["max_seams"] == 4
    # delta far beyond the precomputed range clamps to -max_seams
    status, body = _get(base, "/resize.png?delta=-999")
    assert status == 200
    assert _png_to_array(body).shape[1] == 56 - 4


def test_precompute_clamps_max_seams(server):
    """max_seams requests beyond dim-1 clamp (the precompute analog of the
    spinbutton clamp)."""
    base, img = server
    status, r = _post(base, "/api/precompute", {
        "max_seams": 10**6, "blocksize": 8, "slider": 1.0, "vertical": False,
    })
    assert status == 200 and r["max_seams"] == 55


def test_html_references_every_endpoint(server):
    """Contract between app.html's JS and the server: every endpoint the
    server exposes is actually wired up in the page (and the coupled-slider
    expression is present client-side too)."""
    base, _ = server
    _, html = _get(base, "/")
    page = html.decode()
    for ep in ("/api/meta", "/image.png", "/preview.png", "/api/precompute",
               "/resize.png", "/api/carve"):
        assert ep in page, f"app.html does not reference {ep}"
