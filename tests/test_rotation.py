"""Derived gate-rotation order (r8 VERDICT #7: the certification
priority rule lives in code, not a hand-maintained list).

The registry's ``queries()`` order is computed by
``_rotation_order`` from the committed ``CORRECTNESS_r*.json`` driver
artifacts + backing-module mtimes: certification DEBT (≥2 rounds
without a driver row) leads, then never-certified gates, then gates
whose backing module changed since their last certification, then
everything else stalest-first — so the driver's ~50-entry cap always
absorbs the gates with the freshest driver rows.
"""

import json
import os
import time

import __spark_entry__ as entry


def _write_art(tmp_path, rnd, names, ok=True, mtime=None):
    row = {"rows_match": ok, "schema_match": ok,
           "hash_match": ok if ok else False,
           "spark_rows": 1, "oracle_rows": 1, "err": None}
    p = tmp_path / f"CORRECTNESS_r{rnd}.json"
    p.write_text(json.dumps({n: dict(row) for n in names}))
    if mtime is not None:
        os.utime(p, (mtime, mtime))
    return p


def _f():
    return None


class TestRotationOrder:
    def test_debt_then_never_then_stale(self, tmp_path):
        gates = {f"g{i}": _f for i in range(6)}
        now = time.time()
        # r6: g0 certified (→ staleness 3 at cur=9: DEBT)
        _write_art(tmp_path, 6, ["g0"], mtime=now - 300)
        # r7: g1, g2 (staleness 2)
        _write_art(tmp_path, 7, ["g1", "g2"], mtime=now - 200)
        # r8: g3, g4 (staleness 1); g5 never certified
        _write_art(tmp_path, 8, ["g3", "g4"], mtime=now - 100)
        order = entry._rotation_order(gates, art_dir=str(tmp_path))
        assert order[0] == "g0"          # debt leads
        assert order[1] == "g5"          # never-certified next
        # remaining by staleness desc, decl order tie-break; _f has no
        # package imports so nothing is "touched"
        assert order[2:] == ["g1", "g2", "g3", "g4"]

    def test_failed_row_is_not_certification(self, tmp_path):
        gates = {"a": _f, "b": _f}
        _write_art(tmp_path, 8, ["a"], ok=False)
        _write_art(tmp_path, 8, ["b"])  # overwritten below
        _write_art(tmp_path, 7, ["b"])
        order = entry._rotation_order(gates, art_dir=str(tmp_path))
        # "a" failed its only row → never certified → outranks stale "b"
        assert order[0] == "a"

    def test_touched_module_promotes(self, tmp_path):
        # a gate whose backing module mtime is newer than its cert
        # artifact outranks a fresher-certified untouched gate
        def touched(spark, sf):
            from wine_label_ocr_spark.operators import cdx  # noqa: F401
        gates = {"plain": _f, "touched": touched}
        now = time.time()
        _write_art(tmp_path, 8, ["plain", "touched"], mtime=now - 100)
        mods = entry._gate_backing_files(touched)
        cdx = [f for f in mods
               if f.endswith(os.path.join("operators", "cdx.py"))]
        assert cdx
        os.utime(cdx[0], None)  # now > artifact mtime
        try:
            order = entry._rotation_order(gates, art_dir=str(tmp_path))
            assert order == ["touched", "plain"]
        finally:
            pass  # mtime bump is harmless (content untouched)

    def test_no_artifacts_is_declaration_order(self, tmp_path):
        gates = {"z": _f, "a": _f, "m": _f}
        assert entry._rotation_order(gates, art_dir=str(tmp_path)) == \
            ["z", "a", "m"]

    def test_live_registry_invariants(self):
        q = entry.queries()
        order = list(q)
        # every oracle key is a registry key and vice-versa pairing holds
        assert set(entry.oracle_sql()) <= set(order)
        # the rotation is a permutation of the declared registry
        assert len(order) == len(set(order))
        # derived order is deterministic across calls
        assert list(entry.queries()) == order

    def test_backing_files_derivation(self):
        q = entry.queries()
        files = entry._gate_backing_files(q["warc_revisit"])
        assert any(f.endswith("cdx.py") or f.endswith("warc.py")
                   for f in files)
