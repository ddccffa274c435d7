"""Message catalogs (SURVEY §2.9 — the reference ships empty gettext
plumbing; here the same translatable surface has real catalogs)."""

import json

from dct_carver_tpu.utils import i18n


def teardown_function():
    i18n.set_language("en")


def test_default_is_identity():
    i18n.set_language("en")
    assert i18n._("Resizing width...") == "Resizing width..."
    assert i18n.get_language() == "en"


def test_german_catalog():
    assert i18n.set_language("de") == "de"
    assert i18n._("Resizing width...") == "Breite wird angepasst..."
    assert i18n._("Edges") == "Kanten"
    # untranslated strings fall back to the msgid
    assert i18n._("not in the catalog") == "not in the catalog"


def test_french_catalog_and_region_suffix():
    # region/encoding suffixes normalize away (LANG=fr_FR.UTF-8)
    assert i18n.set_language("fr_FR.UTF-8") == "fr"
    assert i18n._("Calculating seams...") == "Calcul des coutures..."


def test_unknown_language_falls_back():
    assert i18n.set_language("xx") == "en"
    assert i18n._("Edges") == "Edges"


def test_available_languages():
    langs = i18n.available_languages()
    assert "en" in langs and "de" in langs and "fr" in langs


def test_catalogs_cover_the_same_surface():
    """Every catalog translates the same msgids (no silently missing keys)."""
    import os

    d = os.path.join(os.path.dirname(i18n.__file__), "..", "locale")
    keysets = {}
    for f in os.listdir(d):
        if f.endswith(".json"):
            with open(os.path.join(d, f), encoding="utf-8") as fh:
                keysets[f] = set(json.load(fh))
    assert len(set(map(frozenset, keysets.values()))) == 1, keysets.keys()


def test_progress_message_localized(rng):
    """The seam-loop progress message (src/render.c:117) goes through the
    catalog."""
    import numpy as np

    from dct_carver_tpu.utils.checkpoint import carve_resumable
    from dct_carver_tpu.utils.config import CarverConfig

    class Capture:
        msg = None

        def init(self, message):
            Capture.msg = message

        def update(self, f):
            pass

        def end(self):
            pass

    i18n.set_language("de")
    luma = rng.random((16, 24)).astype(np.float32)
    carve_resumable(luma, 2, CarverConfig(), progress=Capture())
    assert Capture.msg == "Breite wird angepasst..."


def test_ui_meta_labels_localized(rng):
    import numpy as np

    from dct_carver_tpu.ui.server import CarverApp

    i18n.set_language("fr")
    app = CarverApp(np.zeros((8, 8, 3), np.uint8))
    meta = app.meta()
    assert meta["language"] == "fr"
    assert meta["labels"]["Edges"] == "Contours"
