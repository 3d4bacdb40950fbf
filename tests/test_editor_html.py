"""Static consistency checks for the self-contained editor UI.

No browser runtime exists in this environment (no Chrome/node), so the
editor's DOM/JS contract is checked statically: every element id the
script references must exist, and the JS braces/parens must balance
(catches truncated edits).  The interaction logic itself is covered at
the HTTP layer (test_map_editor.py drives the same backend surface the
UI calls, including set_vertex_pose for vertex drag)."""
import os
import re

HTML = os.path.join(os.path.dirname(__file__), "..",
                    "lsd_tpu", "web", "www", "editor.html")


def _read():
    with open(HTML) as fh:
        return fh.read()


def test_all_referenced_ids_exist():
    src = _read()
    ids_defined = set(re.findall(r'id="([\w-]+)"', src))
    ids_used = set(re.findall(r'\$\("([\w-]+)"\)', src))
    # dynamic ids composed with + (e.g. $(id + "-v")) resolve per slider
    for sid in ("zmin", "zmax", "ptsize", "budget",
                "loop-dx", "loop-dy", "loop-dz", "loop-yaw"):
        if sid in ids_defined:
            ids_used.add(sid + "-v")
    missing = ids_used - ids_defined
    assert not missing, f"JS references missing DOM ids: {sorted(missing)}"


def test_script_brackets_balance():
    src = _read()
    m = re.search(r"<script>(.*)</script>", src, re.S)
    assert m, "no script block"
    js = m.group(1)
    # strip strings/template literals/comments crudely but safely enough
    js = re.sub(r"//[^\n]*", "", js)
    js = re.sub(r"/\*.*?\*/", "", js, flags=re.S)
    js = re.sub(r"`(?:[^`\\]|\\.)*`", "``", js, flags=re.S)
    js = re.sub(r'"(?:[^"\\]|\\.)*"', '""', js)
    js = re.sub(r"'(?:[^'\\]|\\.)*'", "''", js)
    for o, c in (("{", "}"), ("(", ")"), ("[", "]")):
        assert js.count(o) == js.count(c), \
            f"unbalanced {o}{c}: {js.count(o)} vs {js.count(c)}"


def test_vertex_drag_wiring_present():
    src = _read()
    assert "map-set-vertex-pose" in src          # commit route
    assert 'kind: "vertex"' in src               # drag state machine
    assert "pickVertex" in src
    assert "applyBudget" in src and "uploadKf" in src   # decimation
