"""Property test for the streaming sink's commit-log protocol
(sources/dwrf_datasource.py): under ANY history of clean commits, torn
appends (crash mid-commit), same-batch retries, later duplicate commits,
file deletions and interleaved in-place compactions, committed_files must
return exactly the FIRST complete commit group per batchId — the
exactly-once contract committedOnly reads are built on. Compaction may
drop history (and entries for deleted files), never add or remove
commits.

One history shape is deliberately NOT generated: a duplicate commit of a
batch whose files were ALL retention-deleted and whose (empty) group a
compaction then dropped. Spark can only re-run the LATEST uncommitted
batch — once later batches committed, the offset log has advanced past
it — and compact_manifest leans on exactly that to bound the log (its
docstring); generating the impossible history would "refute" a guarantee
nobody needs."""

from __future__ import annotations

import os

from hypothesis import given, settings
from hypothesis import strategies as st

# per batch: (n_files, outcome, delete_one_after, compact_after)
# outcomes: "clean", "torn" (no #end), "torn_retry" (torn attempt then a
# complete retry of the SAME batchId), "dup" (clean commit now, spurious
# duplicate complete group appended at the end of the history)
outcome = st.sampled_from(["clean", "torn", "torn_retry", "dup"])
batch = st.tuples(
    st.integers(1, 3), outcome, st.booleans(), st.booleans()
)


def _write_group(path: str, bid: int, rels: list[str], torn: bool) -> None:
    with open(path, "a") as f:
        f.write(f"#begin\t{bid}\n")
        for r in rels:
            f.write(f"{bid}\t{r}\t1\n")
        if not torn:
            f.write(f"#end\t{bid}\n")


@settings(max_examples=60, deadline=None)
@given(hist=st.lists(batch, min_size=1, max_size=12))
def test_commit_log_resolves_first_complete_group(tmp_path_factory, hist):
    from hive_dwrf_spark.sources.dwrf_datasource import (
        committed_files,
        compact_manifest,
    )

    out = str(tmp_path_factory.mktemp("sink"))
    log = os.path.join(out, "_batches")
    open(log, "w").close()
    expected: dict[int, set[str]] = {}  # bid -> first COMPLETE group
    on_disk: set[str] = set()
    dups: list[tuple[int, list[str]]] = []
    for bid, (n, kind, delete_one_after, compact_after) in enumerate(hist):
        rels = [f"b{bid}-f{i}.dwrf" for i in range(n)]
        retry = [f"b{bid}-r{i}.dwrf" for i in range(n)]
        for r in rels + retry:
            with open(os.path.join(out, r), "wb") as fh:
                fh.write(b"x")
            on_disk.add(r)
        if kind in ("clean", "dup"):
            _write_group(log, bid, rels, torn=False)
            expected[bid] = set(rels)
            if kind == "dup":
                dups.append((bid, retry))
        elif kind == "torn":
            # crash, never retried: nothing committed for this bid (a
            # later batch's #begin discards the unterminated lines)
            _write_group(log, bid, rels, torn=True)
        elif kind == "torn_retry":
            _write_group(log, bid, rels, torn=True)
            _write_group(log, bid, retry, torn=False)
            expected[bid] = set(retry)
        if delete_one_after and kind != "dup" and expected.get(bid):
            victim = sorted(expected[bid])[0]
            os.remove(os.path.join(out, victim))
            on_disk.discard(victim)
        if compact_after:
            compact_manifest(out, force=True)
    # spurious duplicate complete groups land after everything — the
    # keep-first entries (still live) must win
    for bid, retry in dups:
        _write_group(log, bid, retry, torn=False)

    want = set().union(*expected.values()) if expected else set()
    for _ in range(3):  # raw log, once-compacted, twice (idempotence)
        got = committed_files(out)
        # exactly-once: the on-disk committed set matches the model
        # exactly (no orphan/torn/retry-loser/dup file ever appears, no
        # first-group file is ever lost); entries for deleted files may
        # linger until a compaction prunes them — harmless, a
        # committedOnly read intersects with the listing
        assert got & on_disk == want & on_disk
        assert got <= want
        compact_manifest(out, force=True)
