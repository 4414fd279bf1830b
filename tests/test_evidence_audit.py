"""The staleness audit must be mechanical and unskippable (r7 verdict).

Two consecutive rounds of by-hand closure auditing missed dependents
(r6: four keys with changed decorated bodies; r7: the two IMI keys whose
shared ``_make_imi_assigner`` / ``_verify_cell_blas`` helpers were
rewritten).  ``tools/evidence_audit.py`` computes each key's transitive
in-repo call closure by static AST walk and diffs it against the git
tree at the key's evidence-round commit.  This test fails the suite
whenever a stale key is neither force-listed in
``__spark_entry__._FORCE_RECHECK`` (at or above its evidence round) nor
already inside the next 50-key driver window — i.e. whenever a driver
green would silently stand in for code it never ran.

No SparkSession needed: the audit is pure AST + git.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def _git_available() -> bool:
    try:
        subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=REPO,
            capture_output=True,
            check=True,
        )
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def test_every_stale_key_is_covered_by_the_next_driver_window():
    if not _git_available():
        import pytest

        pytest.skip("no git history available")
    import evidence_audit as EA

    rep = EA.coverage_report()
    assert rep["uncovered"] == {}, (
        "keys whose helper closure changed after their latest driver "
        f"evidence, with no re-proof scheduled: {rep['uncovered']} — add "
        "each to __spark_entry__._FORCE_RECHECK at its evidence round"
    )


def test_force_recheck_live_vs_expired_annotation(monkeypatch):
    """coverage_report must separate live forces (still displacing
    window slots) from expired ones (satisfied by later evidence) —
    the raw dict used to be dumped whole and read as pending work
    (r10 VERDICT item 3). stale_keys is stubbed out: this pins the
    annotation logic, not the closure walk."""
    import __spark_entry__ as entry
    import evidence_audit as EA

    evidence = entry._driver_evidence()
    greens = sorted(k for k, v in evidence.items() if v[1])
    assert len(greens) >= 2, "fixture needs two driver-green keys"
    k_expired, k_live = greens[0], greens[1]
    forced = {
        # evidence round > forced round: the green re-proof landed
        k_expired: evidence[k_expired][0] - 1,
        # evidence round <= forced round: still awaiting re-proof
        k_live: evidence[k_live][0],
    }
    monkeypatch.setattr(entry, "_FORCE_RECHECK", forced)
    monkeypatch.setattr(EA, "stale_keys", lambda: {})
    rep = EA.coverage_report()
    assert rep["force_expired"] == {k_expired: forced[k_expired]}
    assert rep["force_recheck"] == {k_live: forced[k_live]}


def test_audit_closure_reaches_shared_helpers_and_local_imports():
    """Regression pins for the exact miss classes the tool exists for:
    module-level helper factories (r7's _make_imi_assigner rewrite) and
    function-LOCAL imports (similarity_ann_imi imports the assigner
    inside its body)."""
    import evidence_audit as EA
    from kafka_parquet_writer_spark.registry import (
        QUERIES,
        load_all_operators,
    )

    load_all_operators()

    def files_of(key):
        return set(EA.closure_of(QUERIES[key]))

    dedup = "kafka_parquet_writer_spark/operators/dedup.py"
    # same-module helper chain: ann -> _make_assigner/_raw_verify
    assert dedup in files_of("dedup_embedding_ann")
    # cross-module function-local import: similarity_ann_imi's body
    # imports _make_imi_assigner from dedup
    assert dedup in files_of("similarity_ann_imi")
    # class dependency: table keys must reach TxTable in tablefmt.py
    assert "kafka_parquet_writer_spark/tablefmt.py" in files_of(
        "table_merge_upsert"
    )
    # composed pipelines must reach their sub-keys' modules
    assert "kafka_parquet_writer_spark/operators/text.py" in files_of(
        "pipeline_clean_corpus"
    ) or "kafka_parquet_writer_spark/operators/web_curation.py" in files_of(
        "pipeline_clean_corpus"
    )
