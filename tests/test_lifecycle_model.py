"""Second-engine equivalence for the Iceberg lifecycle band.

No iceberg-spark-runtime jar, pyiceberg wheel, or network exists in this
container (tests/test_iceberg_runtime.py is the feature-flagged probe for
the real-catalog path and skips visibly), so this suite is the offline
certificate for the modeled semantics: an INDEPENDENT pure-Python
interpreter of the Iceberg snapshot model — a table is an operation log of
commits, snapshot ``s``'s state is the live-file set after replaying
commits ``0..s``, and every question (time travel, incremental diff, expiry
GC, MERGE, equality deletes) is answered by brute force over that replay,
with no intervals and no closed forms anywhere. Hypothesis generates random
operation logs and drives BOTH engines: the interpreter here, and the exact
Spark functions the registered queries call (operators/lifecycle.py). Where
the Spark side uses a closed form (e.g. reclaimable ⇔ removed_snap <=
cut+1), the interpreter deliberately uses the ∀-retained-snapshots
definition instead, so agreement is evidence, not tautology.

Semantics source: the public Iceberg spec (v2 snapshot / manifest-list /
sequence-number model); reference parallel: the reference also simulates
manifests in pure Python (poc/utils/manifest_generator.py:31-127).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from iceberg_benchmark_poc_spark.operators.lifecycle import (
    apply_equality_deletes,
    change_events,
    expiry_cut,
    merge_latest_wins,
    reclaimable_after_expiry,
    visible_at,
)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


# ---------------------------------------------------------------------------
# the interpreter: an operation-log replay of the Iceberg snapshot model
# ---------------------------------------------------------------------------


class TableLog:
    """Commit log → per-snapshot live-file sets, by replay (no intervals)."""

    def __init__(self) -> None:
        self.commits: list[tuple[list[int], list[int]]] = []  # (added, removed)
        self.meta: dict[int, tuple[int, int]] = {}  # fid -> (records, bytes)
        self._next_fid = 0

    def commit(self, n_add: int, remove: list[int]) -> None:
        added = []
        for _ in range(n_add):
            fid = self._next_fid
            self._next_fid += 1
            # deterministic, distinct metadata so aggregate mismatches surface
            self.meta[fid] = (100 + fid * 7, 1000 + fid * 13)
            added.append(fid)
        self.commits.append((added, remove))

    def snapshots(self) -> list[set[int]]:
        """Live-file set after each commit — brute-force replay."""
        live: set[int] = set()
        states = []
        for added, removed in self.commits:
            live |= set(added)
            live -= set(removed)
            states.append(set(live))
        return states

    # -- lineage rows for the Spark side (the model under test) ----------
    def lineage_rows(self) -> list[tuple[int, int, int, int, int]]:
        n = len(self.commits)
        added_at: dict[int, int] = {}
        removed_at: dict[int, int] = {}
        for s, (added, removed) in enumerate(self.commits):
            for f in added:
                added_at[f] = s
            for f in removed:
                removed_at[f] = s
        return [
            (f, added_at[f], removed_at.get(f, n), *self.meta[f])
            for f in added_at
        ]


@st.composite
def table_logs(draw):
    """Random commit logs: 2-7 commits, each adding 0-4 files and removing a
    subset of currently-live files PLUS, sometimes, files added in the same
    commit (empty visibility interval — a file that was never live anywhere;
    the r04 advice case the remove-only-live generator could not reach)."""
    log = TableLog()
    n_commits = draw(st.integers(2, 7))
    live: set[int] = set()
    for _ in range(n_commits):
        n_add = draw(st.integers(0, 4))
        removable = sorted(live)
        remove = draw(
            st.lists(st.sampled_from(removable), unique=True, max_size=len(removable))
            if removable
            else st.just([])
        )
        before = log._next_fid
        same_commit_fids = list(range(before, before + n_add))
        same_commit_remove = draw(
            st.lists(st.sampled_from(same_commit_fids), unique=True, max_size=n_add)
            if same_commit_fids
            else st.just([])
        )
        log.commit(n_add, remove + same_commit_remove)
        live |= set(same_commit_fids)
        live -= set(remove) | set(same_commit_remove)
    return log


_LINEAGE_SCHEMA = (
    "file_id long, added_snap long, removed_snap long, record_count long, file_size_bytes long"
)


def _lineage_df(spark, log: TableLog):
    return spark.createDataFrame(log.lineage_rows(), _LINEAGE_SCHEMA)


# ---------------------------------------------------------------------------
# time travel: interval filter == replay state, at EVERY snapshot
# ---------------------------------------------------------------------------


@given(log=table_logs())
@settings(**SETTINGS)
def test_time_travel_matches_replay(spark, log):
    states = log.snapshots()
    lin = _lineage_df(spark, log).cache()
    try:
        for s, expect in enumerate(states):
            got = {r["file_id"] for r in visible_at(lin, s).collect()}
            assert got == expect, f"snapshot {s}: interval model {got} != replay {expect}"
    finally:
        lin.unpersist()


# ---------------------------------------------------------------------------
# incremental diff: event stream == set differences of consecutive replays
# ---------------------------------------------------------------------------


@given(log=table_logs(), data=st.data())
@settings(**SETTINGS)
def test_change_events_match_replay_diffs(spark, log, data):
    n = len(log.commits)
    lo = data.draw(st.integers(-1, n - 2), label="lo")
    hi = data.draw(st.integers(lo + 1, n - 1), label="hi")
    states = log.snapshots()
    # brute force: per-commit adds/removes from consecutive set differences
    expect: dict[int, tuple[set[int], set[int]]] = {}
    for s in range(lo + 1, hi + 1):
        prev = states[s - 1] if s > 0 else set()
        adds, removes = states[s] - prev, prev - states[s]
        if adds or removes:
            expect[s] = (adds, removes)
    got: dict[int, tuple[set[int], set[int]]] = {}
    rows = change_events(_lineage_df(spark, log), lo, hi).collect()
    for r in rows:
        a, rm = got.setdefault(r["snap"], (set(), set()))
        # record_count = 100 + fid*7 is injective, so events map back to files
        fid = (r["record_count"] - 100) // 7
        (a if r["is_add"] == 1 else rm).add(fid)
    assert got == expect


# ---------------------------------------------------------------------------
# expiry GC: closed form == ∀-retained-snapshot brute force
# ---------------------------------------------------------------------------


@given(log=table_logs(), data=st.data())
@settings(**SETTINGS)
def test_expiry_reclaimable_matches_brute_force(spark, log, data):
    n = len(log.commits)
    cut = data.draw(st.integers(0, n - 2), label="cut")  # retain at least one
    states = log.snapshots()
    retained = range(cut + 1, n)
    # brute force over the DEFINITION: reclaimable iff visible in no
    # retained snapshot (the closed form removed_snap <= cut+1 never appears
    # on this side)
    all_files = set(log.meta)
    needed = set().union(*(states[s] for s in retained)) if retained else set()
    expect = all_files - needed
    got = {
        r["file_id"]
        for r in reclaimable_after_expiry(_lineage_df(spark, log), cut).collect()
        if r["reclaimable"]
    }
    assert got == expect


@given(ids=st.lists(st.integers(0, 10**12), min_size=1, max_size=20, unique=True))
@settings(**SETTINGS)
def test_expiry_cut_expression_matches_integer_formula(spark, ids):
    from iceberg_benchmark_poc_spark.queries.manifests import EXPIRE_PCT

    df = spark.createDataFrame([(i,) for i in ids], ["snapshot_id"])
    got = df.select(expiry_cut(EXPIRE_PCT).alias("cut")).collect()[0]["cut"]
    expect = min(ids) + (max(ids) - min(ids)) * EXPIRE_PCT // 100
    assert got == expect


# ---------------------------------------------------------------------------
# MERGE (latest-wins upsert): window plan == dict fold
# ---------------------------------------------------------------------------


@given(data=st.data())
@settings(**SETTINGS)
def test_merge_latest_wins_matches_dict_fold(spark, data):
    keys = data.draw(st.lists(st.integers(0, 30), unique=True, min_size=1, max_size=15))
    upd_keys = data.draw(st.lists(st.integers(0, 40), unique=True, max_size=10))
    ins_keys = data.draw(st.lists(st.integers(31, 60), unique=True, max_size=5))
    base_rows = [(k, float(k * 10), 0) for k in keys]
    upd_rows = [(k, float(k * 10 + 1), 1) for k in upd_keys]
    ins_rows = [(k, float(k * 10 + 2), 2) for k in ins_keys]
    # interpreter: plain dict fold, highest src wins per key
    expect: dict[int, tuple[float, int]] = {}
    for k, v, src in base_rows + upd_rows + ins_rows:
        if k not in expect or src > expect[k][1]:
            expect[k] = (v, src)
    schema = "k long, v double, src long"
    base = spark.createDataFrame(base_rows, schema)
    updates = spark.createDataFrame(upd_rows + ins_rows, schema)
    got = {r["k"]: (r["v"], r["src"]) for r in merge_latest_wins(base, updates, "k").collect()}
    assert got == expect


# ---------------------------------------------------------------------------
# equality deletes: broadcast anti join == row-at-a-time rule
# ---------------------------------------------------------------------------


@given(data=st.data())
@settings(**SETTINGS)
def test_equality_deletes_match_row_rule(spark, data):
    rows = data.draw(
        st.lists(
            st.tuples(st.integers(0, 9), st.integers(0, 99)),  # (key, data_seq)
            min_size=1,
            max_size=30,
        )
    )
    del_keys = data.draw(st.lists(st.integers(0, 9), unique=True, max_size=8))
    del_rows = [(k, data.draw(st.integers(0, 99), label=f"dseq{k}")) for k in del_keys]
    # interpreter: the spec sentence, one row at a time — delete every row
    # whose key equals K and whose data sequence is OLDER than the delete's
    dmap = dict(del_rows)
    expect = sorted(
        (k, s) for k, s in rows if not (k in dmap and s < dmap[k])
    )
    data_df = spark.createDataFrame(
        [(i, k, s) for i, (k, s) in enumerate(rows)], "rid long, key long, data_seq long"
    )
    deletes = spark.createDataFrame(del_rows, "custkey long, delete_seq long")
    got = sorted(
        (r["key"], r["data_seq"])
        for r in apply_equality_deletes(data_df, deletes, "key").collect()
    )
    assert got == expect
