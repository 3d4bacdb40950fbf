"""Preview UI interactive-3D features (VERDICT r3 #8) + ROI wiring.

No browser/node runtime exists in this image, so the preview page's
DOM/JS contract is checked statically (same harness style as
test_editor_html.py), the ground-plane unproject math is re-validated
numerically in Python against the page's own camera model, and the ROI
path is driven end-to-end through DetectModule/ObjectFilter.
"""
import os
import re

import numpy as np

HTML = os.path.join(os.path.dirname(__file__), "..",
                    "lsd_tpu", "web", "www", "index.html")


def _read():
    with open(HTML) as fh:
        return fh.read()


class TestPreviewDom:
    def test_referenced_ids_exist(self):
        src = _read()
        ids_defined = set(re.findall(r'id="([\w-]+)"', src))
        ids_used = set(re.findall(r'\$\("([\w-]+)"\)', src))
        missing = ids_used - ids_defined
        assert not missing, f"JS references missing DOM ids: {sorted(missing)}"

    def test_script_brackets_balance(self):
        src = _read()
        m = re.search(r"<script>(.*)</script>", src, re.S)
        assert m
        js = re.sub(r"//[^\n]*", "", m.group(1))
        js = re.sub(r"/\*.*?\*/", "", js, flags=re.S)
        # template literals FIRST: they may contain quotes/braces that
        # the naive quote-stripping would otherwise pair across strings
        js = re.sub(r"`(?:[^`\\]|\\.)*`", "``", js)
        js = re.sub(r'"(?:[^"\\]|\\.)*"', '""', js)
        js = re.sub(r"'(?:[^'\\]|\\.)*'", "''", js)
        for o, c in (("{", "}"), ("(", ")"), ("[", "]")):
            assert js.count(o) == js.count(c), f"unbalanced {o}{c}"

    def test_feature_hooks_present(self):
        """The r4 interactive-3D features are wired: camera inertia,
        ego trail, ROI sketchpad, TViz history window."""
        src = _read()
        assert "applyInertia" in src and "INERTIA" in src
        # inertia applied in the render loop, velocities seeded on drag
        assert re.search(r"function draw\(\)\s*{\s*applyInertia\(\);", src)
        assert "egoTrail" in src and "CarTrajectory" in src
        for eid in ("roi-btn", "roi-kind", "t-window"):
            assert f'id="{eid}"' in src, eid
        assert "unprojectToGround" in src
        assert "/v1/roi" in src and "is_included" in src

    def test_config_form_present(self):
        """Structured per-field config form (ref components/config):
        schema-driven renderer + typed leaf inputs + JSON round-trip."""
        src = _read()
        for eid in ("cfg-form", "cfg-mode"):
            assert f'id="{eid}"' in src, eid
        for fn in ("cfgRenderNode", "cfgLeafInput", "cfgFormRender",
                   "cfgSet"):
            assert fn in src, fn
        # typed leaves: bool checkbox, number input, numeric-list text
        for t in ("data-type=\"bool\"", "data-type=\"num\"",
                  "data-type=\"numlist\""):
            assert t.replace("\\", "") in src.replace("\\", ""), t

    def test_colormodes_and_overlays(self):
        src = _read()
        assert 'value="height"' in src and 'value="intensity"' in src
        for eid in ("show-labels", "show-fs", "follow", "camsel"):
            assert f'id="{eid}"' in src, eid


class TestUnprojectMath:
    """Python re-derivation of the page's unprojectToGround: a ground
    point projected through the page's mvp() must unproject back to
    itself.  Pins the ray/basis math the browser runs."""

    F, AR = 1.2, 900 / 600.0
    W, H = 900, 600

    def _basis(self, cam):
        ce, se = np.cos(cam["el"]), np.sin(cam["el"])
        ca, sa = np.cos(cam["az"]), np.sin(cam["az"])
        eye = np.asarray([cam["tx"] + cam["dist"] * ce * ca,
                          cam["ty"] + cam["dist"] * ce * sa,
                          cam["tz"] + cam["dist"] * se])
        z = np.asarray([ce * ca, ce * sa, se])
        x = np.asarray([-z[1], z[0], 0.0])
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        return eye, x, y, z

    def _project(self, cam, p):
        """world point -> pixel, exactly the page's view+proj chain."""
        eye, x, y, z = self._basis(cam)
        d = p - eye
        Xc, Yc, Zc = d @ x, d @ y, d @ z
        xn = (self.F / self.AR) * Xc / (-Zc)
        yn = self.F * Yc / (-Zc)
        return ((xn + 1) / 2 * self.W, (1 - yn) / 2 * self.H)

    def _unproject(self, cam, px, py, roi_z=-1.6):
        eye, x, y, z = self._basis(cam)
        xn = (2 * px / self.W - 1) * self.AR / self.F
        yn = (1 - 2 * py / self.H) / self.F
        direc = xn * x + yn * y - z
        t = (roi_z - eye[2]) / direc[2]
        return eye + t * direc

    def test_roundtrip_ground_points(self):
        cam = dict(az=-np.pi / 2 + 0.3, el=0.9, dist=60.0,
                   tx=5.0, ty=-3.0, tz=0.0)
        for gx, gy in [(0, 0), (10, 5), (-20, 14), (3, -30)]:
            p = np.asarray([gx, gy, -1.6])
            px, py = self._project(cam, p)
            q = self._unproject(cam, px, py)
            np.testing.assert_allclose(q, p, atol=1e-6)


class TestRoiWiring:
    def _mod(self, roi):
        import copy
        from lsd_tpu.runtime import clear_interfaces
        from lsd_tpu.runtime.config import AttrDict, DEFAULT_CONFIG
        from lsd_tpu.runtime.modules import DetectModule
        clear_interfaces()
        cfg = AttrDict(copy.deepcopy(DEFAULT_CONFIG))
        cfg["roi"] = roi
        mod = DetectModule(cfg)
        mod.setup(cfg)
        return mod

    def test_exclude_roi_filters_objects(self):
        mod = self._mod([dict(contour=[[-5, -5], [5, -5], [5, 5], [-5, 5]],
                              is_included=False)])
        objs = [dict(box=np.asarray([0.0, 0, 0, 4, 2, 1.6, 0]), label=0,
                     score=0.9),
                dict(box=np.asarray([20.0, 0, 0, 4, 2, 1.6, 0]), label=0,
                     score=0.9)]
        out = mod.obj_filter.filter(dict(objects=objs))
        assert [o["box"][0] for o in out["objects"]] == [20.0]

    def test_include_roi_filters_objects(self):
        mod = self._mod([dict(contour=[[-5, -5], [5, -5], [5, 5], [-5, 5]],
                              is_included=True)])
        objs = [dict(box=np.asarray([0.0, 0, 0, 4, 2, 1.6, 0]), label=0,
                     score=0.9),
                dict(box=np.asarray([20.0, 0, 0, 4, 2, 1.6, 0]), label=0,
                     score=0.9)]
        out = mod.obj_filter.filter(dict(objects=objs))
        assert [o["box"][0] for o in out["objects"]] == [0.0]

    def test_live_set_roi_interface(self):
        from lsd_tpu.runtime.interface import call_interface
        mod = self._mod([])
        assert mod.obj_filter.include == [] and mod.obj_filter.exclude == []
        call_interface("detect.set_roi",
                       [dict(contour=[[-1, -1], [1, -1], [1, 1], [-1, 1]],
                             is_included=False)])
        assert len(mod.obj_filter.exclude) == 1
