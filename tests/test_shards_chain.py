"""Unit tests (no Spark jobs) for the manifest lineage chain walk —
the primitive behind retention GC, version listing, and pin resolution
(`writers._manifest_chain`). Exercises edge shapes that are awkward to
reach through the full publish path: cycles, migration anchors,
GC-truncated predecessors, pre-lineage manifests."""

import json
import os

import pytest

from docarray_spark.sources.writers import _manifest_chain, _parse_seq


def _mk_export(tmp_path, manifests):
    """manifests: list of (name, prev) — writes minimal manifest files."""
    root = str(tmp_path / "exp")
    os.makedirs(os.path.join(root, "_manifests"))
    for name, prev in manifests:
        body = {
            "format": 3, "n": _parse_seq(name),
            "batches_by_shard": {}, "prev": prev,
        }
        with open(os.path.join(root, "_manifests", f"{name}.json"), "w") as f:
            json.dump(body, f)
    return root


class TestManifestChain:
    def test_walk_and_limit(self, tmp_path):
        root = _mk_export(tmp_path, [
            ("_m_0000000001_aaaaaaaa", None),
            ("_m_0000000002_bbbbbbbb", "_m_0000000001_aaaaaaaa"),
            ("_m_0000000003_cccccccc", "_m_0000000002_bbbbbbbb"),
        ])
        cur = "_m_0000000003_cccccccc"
        assert _manifest_chain(root, cur, None) == [
            cur, "_m_0000000002_bbbbbbbb", "_m_0000000001_aaaaaaaa",
        ]
        assert _manifest_chain(root, cur, None, limit=2) == [
            cur, "_m_0000000002_bbbbbbbb",
        ]
        assert _manifest_chain(root, cur, None, limit=1) == [cur]

    def test_same_sequence_orphan_excluded(self, tmp_path):
        root = _mk_export(tmp_path, [
            ("_m_0000000001_aaaaaaaa", None),
            ("_m_0000000002_bbbbbbbb", "_m_0000000001_aaaaaaaa"),
            # lost-race orphan: same sequence, lexically LAST token —
            # off-chain because nothing links to it
            ("_m_0000000002_zzzzzzzz", "_m_0000000001_aaaaaaaa"),
        ])
        chain = _manifest_chain(root, "_m_0000000002_bbbbbbbb", None)
        assert "_m_0000000002_zzzzzzzz" not in chain
        assert chain == ["_m_0000000002_bbbbbbbb", "_m_0000000001_aaaaaaaa"]

    def test_gcd_predecessor_ends_walk(self, tmp_path):
        root = _mk_export(tmp_path, [
            ("_m_0000000003_cccccccc", "_m_0000000002_bbbbbbbb"),
        ])  # predecessor already GC'd: listed names don't contain it
        assert _manifest_chain(root, "_m_0000000003_cccccccc", None) == [
            "_m_0000000003_cccccccc",
        ]

    def test_pointer_migration_anchor_ends_walk(self, tmp_path):
        # first manifest after a pointer->manifest migration records the
        # _v_ dir as prev — not a manifest, walk stops
        root = _mk_export(tmp_path, [
            ("_m_0000000002_bbbbbbbb", "_v_0000000001"),
        ])
        assert _manifest_chain(root, "_m_0000000002_bbbbbbbb", None) == [
            "_m_0000000002_bbbbbbbb",
        ]

    def test_cycle_is_bounded(self, tmp_path):
        # corrupted prev links forming a cycle must not loop forever
        root = _mk_export(tmp_path, [
            ("_m_0000000001_aaaaaaaa", "_m_0000000002_bbbbbbbb"),
            ("_m_0000000002_bbbbbbbb", "_m_0000000001_aaaaaaaa"),
        ])
        chain = _manifest_chain(root, "_m_0000000002_bbbbbbbb", None)
        assert chain == ["_m_0000000002_bbbbbbbb", "_m_0000000001_aaaaaaaa"]

    def test_pre_lineage_manifest_ends_walk(self, tmp_path):
        root = str(tmp_path / "legacy")
        os.makedirs(os.path.join(root, "_manifests"))
        for name, body in [
            ("_m_0000000001_aaaaaaaa",
             {"format": 3, "n": 1, "batches_by_shard": {}}),  # no prev
            ("_m_0000000002_bbbbbbbb",
             {"format": 3, "n": 2, "batches_by_shard": {},
              "prev": "_m_0000000001_aaaaaaaa"}),
        ]:
            with open(
                os.path.join(root, "_manifests", f"{name}.json"), "w"
            ) as f:
                json.dump(body, f)
        chain = _manifest_chain(root, "_m_0000000002_bbbbbbbb", None)
        assert chain == ["_m_0000000002_bbbbbbbb", "_m_0000000001_aaaaaaaa"]

    def test_unreadable_manifest_propagates(self, tmp_path):
        """A listed-but-unreadable manifest must RAISE, not silently
        truncate the chain — GC deletes everything off-chain."""
        root = _mk_export(tmp_path, [
            ("_m_0000000002_bbbbbbbb", "_m_0000000001_aaaaaaaa"),
        ])
        # the predecessor exists in the listing but holds garbage
        with open(
            os.path.join(root, "_manifests", "_m_0000000001_aaaaaaaa.json"),
            "w",
        ) as f:
            f.write("{not json")
        with pytest.raises(Exception):
            _manifest_chain(root, "_m_0000000002_bbbbbbbb", None)
