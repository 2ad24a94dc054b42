"""Endurance invariants in miniature (the >=16-cdc-epoch scale run lives
in scripts/endurance_replay.py -> BENCH_ENDURANCE artifact): a 16-epoch
(8 cdc + 8 usage, interleaved) MoR replay with compaction cadence and a
simulated mid-run kill must (a) digest-match an identical CoW replay and
(b) resume via the epoch ledger with every already-applied epoch skipped."""

import importlib.util
import os

from amundsendatabuilder_spark.sources.changelog import write_changelog_chunks

_spec = importlib.util.spec_from_file_location(
    "endurance_replay",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "endurance_replay.py"))
endurance = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(endurance)


def test_endurance_mor_parity_and_resume(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("endurance_cl"))
    chunks = write_changelog_chunks(spark, d, 6000, 8, n_entities=400)

    mor = endurance.run_replay(spark, chunks, "mor", kill_at=4, n_buckets=8)
    cow = endurance.run_replay(spark, chunks, "cow", n_buckets=8)

    assert len(mor["epoch_walls"]) == 8
    # the kill-resume re-replayed the first 4 cdc epochs; ledger no-ops all
    assert mor["resumed_skips"] == 4
    # MoR (append + compaction + read-time LWW) == CoW final state across
    # every table, usage included
    assert mor["digest"] == cow["digest"]
    assert mor["rows"] == cow["rows"] > 0
