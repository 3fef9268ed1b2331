"""Keyed, mutable, catalog-registered tables — the reference's table
abstraction (Hudi COPY_ON_WRITE + Hive sync, /root/reference/README.md:
295-313) implemented portably over partitioned parquet.

Semantics owned here (reference tier B):
- B5  upsert: latest-wins merge on a declared key + ordering field
- B8  deletes: op='d' rows drop the key
- B10 hive-style partition layout (``partition_by``)
- B11 schema reconciliation on write (unionByName inside merge_upsert)
- B12 catalog sync: ``register`` ≡ hive_sync (temp view locally; on a real
  cluster ``saveAsTable`` against the metastore)

COW strategy at scale: with ``partition_by`` set and the session's
``partitionOverwriteMode=dynamic`` (session.py), an upsert rewrites ONLY
the partitions containing changed keys — the Hudi file-group analogue. The
merge shuffles once on the key; the unchanged-partition data is never read
or written.

A real Hudi writer is used if the jar happens to be present
(``format("hudi")``, README.md:337 intent); this container ships none, so
the native path is the default and the Hudi path stays behind a capability
probe.
"""

from __future__ import annotations

import sys
import threading
from collections.abc import Sequence
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .operators.merge import cdc_meta_columns, merge_upsert


def _union_schema(base: T.StructType, extra: T.StructType) -> T.StructType:
    """Schema reconciliation for the sidecar: keep ``base``'s column order,
    take ``extra``'s type for matching names (the merge's unionByName has
    already reconciled it — the latest write defines the current type),
    append columns only ``extra`` has. Monotone: a column, once present,
    never leaves except through an explicit table replace (init)."""
    by_name = {f.name: f for f in extra.fields}
    fields = [by_name.get(f.name, f) for f in base.fields]
    have = {f.name for f in base.fields}
    fields += [f for f in extra.fields if f.name not in have]
    return T.StructType(fields)


class SchemaSidecar:
    """The table's authoritative current schema, persisted in the commit
    path — how every commit-log table format (Hudi/Delta/Iceberg) closes
    the schema-drift footgun this engine had behind the ``merge_schema``
    knob: a PARTITIONED table that gains a column through reconciliation
    (B11) rewrites only touched partitions, so untouched partitions keep
    old-schema footers, and a footer-inferred read picks ONE arbitrary
    footer — the drifted column nondeterministically vanishes, and the
    upsert's own ``current = self.read()`` then rewrites partitions
    WITHOUT it (permanent loss, no error).

    Layout: ``{table}__schema/v{seq:012d}/schema.json`` (StructType.json).
    Publish is the repo's standard stage + commit-CAS (fsutil.publish_commit)
    with a monotone-union retry loop, so racing writers can only WIDEN the
    schema, never clobber each other's columns; retention keeps the two
    newest versions (in-flight readers of the previous one stay valid).
    Readers (``KeyedTable.read``, MOR delta reads) apply the sidecar as the
    explicit parquet read schema — per-file missing columns null-fill,
    column order is stable, and no footer lottery remains. Missing or
    unreadable sidecar falls back to today's footer inference (+ the
    ``merge_schema`` knob), so pre-sidecar tables stay readable."""

    #: Claimed-but-never-resolved sidecar versions already waited out
    #: (legacy two-step pointer claims whose filler crashed). Process-wide:
    #: sidecar objects are constructed per micro-batch, and re-paying the
    #: unresolved-tip wait on every commit would tax the hot path for a
    #: name that is burned forever.
    _BURNED_VERSIONS: set[tuple[str, int]] = set()

    #: Claim-pointer observation memory for the stall-based burned arbiter
    #: (fsutil.claim_is_stalled), process-wide for the same reason as
    #: _BURNED_VERSIONS. Bounded: entries are (ptr path → signature) pairs
    #: and a long-lived driver touching many tables must not grow this
    #: without limit (FIFO eviction, like _LEASE_OWNER_CACHE).
    _CLAIM_SEEN: dict[str, tuple[object, float]] = {}

    def __init__(self, spark: SparkSession, table_path: str) -> None:
        self.spark = spark
        self.dir = f"{table_path}__schema"
        self.stage_root = f"{table_path}__schema_stage"

    def _fs(self):
        from .fsutil import hadoop_fs

        return hadoop_fs(self.spark, self.dir)

    def _versions(self, fs, hpath) -> list[tuple[int, str | None]]:
        """(seq, content_uri) pairs, seq-ascending. ``content_uri`` is None
        for an in-flight/burned pointer commit (claim without fill — see
        fsutil.pointer_commit): unreadable, but its NAME is allocated, so
        publishers must count it and readers must skip it."""
        from .fsutil import list_commits

        out = []
        for name, content in list_commits(fs, hpath, self.spark, self.dir):
            if name.startswith("v") and name[1:].isdigit():
                out.append((int(name[1:]), content))
        out.sort()
        return out

    def _parse(self, fs, hpath, uri: str | None) -> T.StructType | None:
        import json as _json

        from .fsutil import read_small_file

        if uri is None:
            return None
        try:
            data = read_small_file(fs, hpath, self.spark, f"{uri}/schema.json")
            if data is None:
                return None
            return T.StructType.fromJson(_json.loads(data.decode("utf-8")))
        except Exception:
            return None

    def current(self) -> T.StructType | None:
        """Newest parseable persisted schema, or None (no sidecar — caller
        falls back to footer inference). Tries the previous version when
        the newest fails to read: a concurrent publisher's trim can delete
        a version between the listing and the read, and falling all the
        way back to footer inference would transiently reopen the exact
        vanishing-column hole the sidecar exists to close. If EVERY listed
        version fails to parse (two publishes landed between this reader's
        listing and its reads, so retention consumed the whole list), the
        listing is retried — a table that HAS a sidecar must not
        transiently read as if it never did."""
        fs, hpath = self._fs()
        for _attempt in range(3):
            versions = self._versions(fs, hpath)
            for _, uri in reversed(versions):
                schema = self._parse(fs, hpath, uri)
                if schema is not None:
                    return schema
            if not versions:
                return None
        return None

    def publish(self, schema: T.StructType, reset: bool = False) -> None:
        """Record ``schema`` (unioned into the current one; ``reset=True``
        replaces it exactly — table init/replace). No-ops without a write
        when nothing changed — the stable-schema hot path pays one listing
        and one small-file read per commit."""
        import uuid as _uuid

        from .fsutil import delete_commit, publish_commit, write_small_file

        fs, hpath = self._fs()
        # Retry budget counts only STALLED attempts (no new version landed
        # since the last look): a lost CAS where the winner's seq moved IS
        # system progress — the union-only-grows loop converges — and a
        # fixed attempt count starved publishers under real contention
        # (found by tests/test_concurrency_hunt.py: 4 racing publishers ×
        # pointer protocol exhausted 5 attempts while the table was
        # perfectly healthy).
        stalled, last_seq = 0, -1
        while stalled < 5:
            versions = self._versions(fs, hpath)
            # Late resolution: a version we once declared burned that now
            # shows RESOLVED was a live filler after all — drop it so the
            # union below includes its columns.
            SchemaSidecar._BURNED_VERSIONS.difference_update(
                (self.dir, s) for s, uri in versions if uri is not None
            )
            # Unresolved-tip guard (same rationale as IncrementalRollup.
            # apply_batch): a claimed name newer than the newest parseable
            # version may be an in-flight publisher on a store where claim
            # and fill are two visible steps — unioning against the OLDER
            # version and publishing past the in-flight one would reopen
            # the vanishing-column hole the sidecar exists to close.
            # Stall-based budget (fsutil.claim_is_stalled): wait while the
            # claim pointer shows liveness; only a claim quiescent for the
            # full budget is burned — a fixed 4×50 ms wait burned any LIVE
            # filler that paused >200 ms between create and close.
            import time as _time

            from .fsutil import claim_is_stalled

            delay = 0.05
            while (
                versions
                and versions[-1][1] is None
                and (self.dir, versions[-1][0])
                not in SchemaSidecar._BURNED_VERSIONS
            ):
                while len(SchemaSidecar._CLAIM_SEEN) >= 4096:
                    SchemaSidecar._CLAIM_SEEN.pop(
                        next(iter(SchemaSidecar._CLAIM_SEEN))
                    )
                if claim_is_stalled(
                    fs, hpath,
                    f"{self.dir}/v{versions[-1][0]:012d}.commit",
                    SchemaSidecar._CLAIM_SEEN,
                ):
                    SchemaSidecar._BURNED_VERSIONS.add(
                        (self.dir, versions[-1][0])
                    )
                    break
                _time.sleep(delay)
                delay = min(delay * 2, 0.4)
                versions = self._versions(fs, hpath)
                SchemaSidecar._BURNED_VERSIONS.difference_update(
                    (self.dir, s) for s, uri in versions if uri is not None
                )
            top_seq = versions[-1][0] if versions else -1
            stalled = 0 if top_seq > last_seq else stalled + 1
            last_seq = top_seq
            # Newest PARSEABLE version — a burned pointer (content=None)
            # must not masquerade as "no sidecar": with reset=False that
            # would skip the union and narrow the published schema.
            cur = None
            for _, uri in reversed(versions):
                cur = self._parse(fs, hpath, uri)
                if cur is not None:
                    break
            want = (
                schema
                if (reset or cur is None)
                else _union_schema(cur, schema)
            )
            if cur is not None and cur.json() == want.json():
                return
            stage = f"{self.stage_root}/{_uuid.uuid4().hex}"
            fs.mkdirs(hpath(stage))
            write_small_file(
                fs, hpath, f"{stage}/schema.json", want.json().encode("utf-8")
            )
            seq = versions[-1][0] + 1 if versions else 0
            # Late-resolution recheck: when publishing past a burned tip,
            # one final listing right before the CAS — if a claim resolved
            # meanwhile (stalled-but-alive filler finished), the schema we
            # unioned from is stale and publishing past it could narrow
            # the sidecar. Rebuild instead. One listing, only on the
            # burned-tip path — never when the tip was resolved.
            if versions and versions[-1][1] is None:
                old_resolved = max(
                    (s for s, uri in versions if uri is not None), default=-1
                )
                fresh = self._versions(fs, hpath)
                if max(
                    (s for s, uri in fresh if uri is not None), default=-1
                ) > old_resolved:
                    SchemaSidecar._BURNED_VERSIONS.difference_update(
                        (self.dir, s) for s, uri in fresh if uri is not None
                    )
                    try:
                        fs.delete(hpath(stage), True)
                    except Exception:
                        pass
                    continue
            if publish_commit(fs, hpath, stage, f"{self.dir}/v{seq:012d}"):
                # Retention: keep this one + the newest RESOLVED
                # predecessor (in-flight readers of the previous version
                # stay valid); drop everything else, burned pointer names
                # included — this is their GC. Keeping versions[-1]
                # unconditionally retained a BURNED tip while deleting the
                # newest parseable predecessor, silently dropping the
                # keep-one-predecessor guarantee exactly when the tip was
                # unreadable.
                keep_prev = max(
                    (s for s, uri in versions if uri is not None),
                    default=None,
                )
                for s, uri in versions:
                    if s == keep_prev:
                        continue
                    delete_commit(fs, hpath, self.dir, f"v{s:012d}", uri)
                try:
                    fs.delete(hpath(self.stage_root), False)
                except Exception:
                    pass
                return
            # Lost the CAS to a concurrent publisher: drop our stage (if
            # the move-INTO undo didn't consume it), re-read, re-union —
            # the loop converges because the union only grows.
            try:
                fs.delete(hpath(stage), True)
            except Exception:
                pass
        raise RuntimeError(
            f"could not publish table schema at {self.dir} after 5 attempts"
        )


def _embedded_commit_schema(spark: SparkSession, uri: str) -> T.StructType | None:
    """Schema-as-of embedded in one snapshot/base commit (``_schema.json``,
    underscore-prefixed so parquet readers ignore the file). Written into
    the STAGE before the commit publishes, so a commit and its schema are
    atomic — historical reads of a drifted table are footer-lottery-free
    exactly like the current read (which uses the sidecar), and a snapshot
    of an EMPTIED table (zero parquet footers) stays readable. None for
    commits written before this existed — callers fall back to footer
    inference."""
    import json as _json

    from .fsutil import hadoop_fs, read_small_file

    try:
        fs, hpath = hadoop_fs(spark, uri)
        data = read_small_file(fs, hpath, spark, f"{uri}/_schema.json")
        if not data:
            return None
        return T.StructType.fromJson(_json.loads(data.decode("utf-8")))
    except Exception:
        return None


def _embed_commit_schema(spark: SparkSession, stage: str, schema: T.StructType) -> None:
    """Write the schema-as-of marker into a STAGED commit dir (must run
    after the parquet write — overwrite staging clears the dir)."""
    from .fsutil import hadoop_fs, write_small_file

    fs, hpath = hadoop_fs(spark, stage)
    write_small_file(
        fs, hpath, f"{stage}/_schema.json", schema.json().encode("utf-8")
    )


class ConcurrentWriterError(RuntimeError):
    """A second writer attempted a data commit on a single-writer table
    (or this writer was fenced by a takeover). Raised INSTEAD of letting
    two read→merge→overwrite cycles interleave as silent lost updates."""


#: One stable writer identity per process: foreachBatch constructs a fresh
#: table object per micro-batch, and all of one pipeline's instances (plus
#: any same-process maintenance like async compaction) are the SAME logical
#: writer. A second process — the actual corruption risk — gets its own id
#: and is fenced.
_PROCESS_WRITER_ID = None


def _process_writer_id() -> str:
    global _PROCESS_WRITER_ID
    if _PROCESS_WRITER_ID is None:
        import os as _os
        import uuid as _uuid

        _PROCESS_WRITER_ID = f"{_os.getpid()}-{_uuid.uuid4().hex[:12]}"
    return _PROCESS_WRITER_ID


#: Thread-scoped writer identity override, set by streaming.pipeline.
#: start_pipeline around each foreachBatch invocation: tables constructed
#: INSIDE a checkpointed pipeline derive their writer id from the
#: CHECKPOINT location, not the process — so a crashed pipeline restarted
#: from its checkpoint (new pid) is the SAME logical writer and re-owns
#: its epoch with no manual take_over, while a different pipeline (other
#: checkpoint) writing the same table is still fenced. Thread-local
#: because concurrent streaming queries run their foreachBatch functions
#: on separate driver threads.
_PIPELINE_WRITER = threading.local()


@contextmanager
def pipeline_writer_scope(writer_id: str):
    """Scope a default writer identity over table constructions on this
    thread (see ``_PIPELINE_WRITER``); explicit ``writer_id`` arguments
    still win."""
    prev = getattr(_PIPELINE_WRITER, "writer_id", None)
    _PIPELINE_WRITER.writer_id = writer_id
    try:
        yield
    finally:
        _PIPELINE_WRITER.writer_id = prev


def _default_writer_id() -> str:
    wid = getattr(_PIPELINE_WRITER, "writer_id", None)
    return wid if wid else _process_writer_id()


#: Epoch commit dirs are immutable once published — owner resolution is
#: memoized process-wide so the steady-state lease check costs ONE listing
#: per data commit, no repeated small-file reads. (Corollary: wiping a
#: table and recreating it at the SAME path within one process reuses any
#: cached epoch owners — recreate under a fresh path, or the same
#: writer_id, as every fixture here does.) FIFO-bounded: epochs per table
#: are few, but a long-lived driver touching many thousands of tables
#: must not grow this without limit.
_LEASE_OWNER_CACHE: dict[str, str] = {}
_LEASE_OWNER_CACHE_MAX = 4096

#: Last heartbeat touch per (lease dir, writer id), in-process rate limit
#: so the liveness signal costs at most one small-file write per
#: heartbeat interval per table — not one per commit. FIFO-bounded like
#: _LEASE_OWNER_CACHE.
_HB_LAST_TOUCH: dict[tuple[str, str], float] = {}


def _heartbeat_interval() -> float:
    """Seconds between owner heartbeat touches (env-overridable:
    ``SPARK_GRAFT_HEARTBEAT_SEC``). ``take_over_if_stale`` TTLs must be
    at least twice this — enforced in ``WriterLease.ensure`` — so a live,
    committing writer can never look stale between touches."""
    import os as _os

    try:
        return float(_os.environ.get("SPARK_GRAFT_HEARTBEAT_SEC", "5.0"))
    except ValueError:
        return 5.0


class WriterLease:
    """Single-writer enforcement for a table path — the fencing-epoch
    protocol (Hudi's lock provider / Delta's log-store mutual exclusion,
    over this repo's own commit-CAS primitive).

    The lease is a monotone timeline of epoch commits under
    ``{table}__writer/`` (``e{seq:012d}`` dirs carrying an ``owner`` file,
    published via fsutil.publish_commit). The NEWEST epoch's owner is the
    table's one legitimate writer:

    - ``ensure()`` before a data commit: newest epoch is mine → proceed
      (one listing; owner reads are memoized — epochs are immutable). No
      epoch yet → claim e0. Another writer's → raise
      :class:`ConcurrentWriterError`, because proceeding is exactly the
      read→merge→overwrite interleave that loses updates silently.
    - ``take_over=True`` claims epoch N+1 over another writer's N — the
      deliberate handover (planned migration, reclaiming from a dead
      ad-hoc writer). The OLD writer is thereby fenced: its next
      ``ensure()``/``check()`` sees a newer epoch it doesn't own and
      raises. Consumed once by the table wrappers (``_ensure_lease``).
      Checkpointed pipelines do NOT need it for crash restart: their
      writer id derives from the checkpoint location
      (streaming.pipeline.checkpoint_writer_id), so a restart from the
      same checkpoint — even in a new process — already owns its epoch.

    What this does and does not guarantee: every steady-state concurrent
    writer fails LOUDLY before touching data; the residual window is one
    in-flight commit racing the takeover itself (ensure passes, takeover
    lands, the fenced writer's write completes before its post-write
    ``check()`` raises) — the same single-commit window Hudi's
    heartbeat-lease expiry has. The post-write check makes even that
    window loud, after the fact."""

    def __init__(self, spark: SparkSession, table_path: str, writer_id: str | None) -> None:
        self.spark = spark
        self.dir = f"{table_path}__writer"
        self.stage_root = f"{table_path}__writer_stage"
        self.writer_id = writer_id or _default_writer_id()

    def _fs(self):
        from .fsutil import hadoop_fs

        return hadoop_fs(self.spark, self.dir)

    def _epochs(self, fs, hpath) -> list[tuple[int, str | None]]:
        from .fsutil import list_commits

        out = []
        for name, content in list_commits(fs, hpath, self.spark, self.dir):
            if name.startswith("e") and name[1:].isdigit():
                out.append((int(name[1:]), content))
        out.sort()
        return out

    def _owner(self, fs, hpath, uri: str | None) -> str | None:
        """Owner id recorded in one epoch commit; None while in-flight
        (pointer claimed but unfilled, or owner file not yet readable)."""
        if uri is None:
            return None
        cached = _LEASE_OWNER_CACHE.get(uri)
        if cached is not None:
            return cached
        from .fsutil import read_small_file

        try:
            data = read_small_file(fs, hpath, self.spark, f"{uri}/owner")
        except Exception:
            return None
        if not data:
            return None
        owner = data.decode("utf-8").strip()
        while len(_LEASE_OWNER_CACHE) >= _LEASE_OWNER_CACHE_MAX:
            # FIFO eviction (insertion-ordered dict): oldest entries are
            # retired epochs — re-resolving one is a single small-file read.
            _LEASE_OWNER_CACHE.pop(next(iter(_LEASE_OWNER_CACHE)))
        _LEASE_OWNER_CACHE[uri] = owner
        return owner

    def _claim(self, fs, hpath, seq: int) -> bool:
        import uuid as _uuid

        from .fsutil import publish_commit, write_small_file

        stage = f"{self.stage_root}/{_uuid.uuid4().hex}"
        fs.mkdirs(hpath(stage))
        write_small_file(fs, hpath, f"{stage}/owner", self.writer_id.encode())
        if publish_commit(fs, hpath, stage, f"{self.dir}/e{seq:012d}"):
            return True
        try:
            fs.delete(hpath(stage), True)
        except Exception:
            pass
        return False

    def _touch_heartbeat(self, fs, hpath) -> None:
        """Owner liveness signal: overwrite ``{dir}/heartbeat`` (content =
        writer id, mtime = last activity), rate-limited in-process to one
        write per heartbeat interval per table. Best-effort — a failed
        touch only means staleness judgments fall back to the epoch owner
        file's mtime (the claim time)."""
        import time as _time

        from .fsutil import write_small_file

        key = (self.dir, self.writer_id)
        now = _time.monotonic()
        last = _HB_LAST_TOUCH.get(key)
        if last is not None and now - last < _heartbeat_interval():
            return
        try:
            write_small_file(
                fs, hpath, f"{self.dir}/heartbeat", self.writer_id.encode()
            )
        except Exception:
            return
        while len(_HB_LAST_TOUCH) >= _LEASE_OWNER_CACHE_MAX:
            _HB_LAST_TOUCH.pop(next(iter(_HB_LAST_TOUCH)))
        _HB_LAST_TOUCH[key] = now

    def _owner_stale(self, fs, hpath, owner: str, uri: str | None, ttl_sec: float) -> bool:
        """True iff ``owner``'s last observable activity — heartbeat mtime
        when the heartbeat names this owner, else its epoch owner file's
        mtime — is at least ``ttl_sec`` old. Unjudgeable (no readable
        timestamp) is NOT stale: self-heal must fail closed, toward the
        loud ConcurrentWriterError, never toward taking over a writer
        whose liveness we could not read. Clock caveat: compares the
        store's mtimes with this driver's wall clock — pick TTLs well
        above any plausible node clock skew (minutes, not seconds, in
        production; the floor below only enforces the heartbeat bound)."""
        import time as _time

        from .fsutil import read_small_file

        last = None
        hb = f"{self.dir}/heartbeat"
        try:
            data = read_small_file(fs, hpath, self.spark, hb)
            if data and data.decode("utf-8", "replace").strip() == owner:
                last = fs.getFileStatus(hpath(hb)).getModificationTime()
        except Exception:
            last = None
        if last is None and uri is not None:
            try:
                last = fs.getFileStatus(
                    hpath(f"{uri}/owner")
                ).getModificationTime()
            except Exception:
                return False
        if last is None:
            return False
        return _time.time() * 1000.0 - float(last) >= ttl_sec * 1000.0

    def ensure(
        self, take_over: bool = False, take_over_if_stale: float | None = None
    ) -> None:
        """Assert (acquiring if free) that this writer owns the table;
        raise :class:`ConcurrentWriterError` otherwise. Called at the top
        of every data-committing method.

        ``take_over_if_stale=<seconds>`` is the UNATTENDED self-heal knob:
        when another writer owns the newest epoch but has shown no
        activity (heartbeat/claim mtime) for at least that long, claim the
        next epoch over it — the crashed-ad-hoc-writer recovery that
        otherwise needs a human passing ``take_over=True`` (USAGE.md).
        A live writer heartbeats on every commit (rate-limited to the
        heartbeat interval), so the TTL must be ≥ 2× the heartbeat
        interval — enforced loudly — and should be far larger in
        production (clock skew, GC pauses). Unlike ``take_over`` this is a
        standing policy, not a one-shot: it only ever fires against a
        STALE owner, so a live owner is never displaced. The fenced
        writer's own next ensure()/check() still raises — same fencing
        residual as a manual takeover."""
        from .fsutil import delete_commit

        fs, hpath = self._fs()
        if take_over_if_stale is not None:
            floor = 2 * _heartbeat_interval()
            if take_over_if_stale < floor:
                raise ValueError(
                    f"take_over_if_stale={take_over_if_stale} is below 2x "
                    f"the heartbeat interval ({floor:.1f}s) — a live owner "
                    "touches its heartbeat at most once per interval, so a "
                    "smaller TTL would take over writers that are merely "
                    "between touches. Raise the TTL (or lower "
                    "SPARK_GRAFT_HEARTBEAT_SEC)."
                )
        # Stall-based retry budget, like SchemaSidecar.publish: a lost
        # claim race where the epoch seq moved is progress (another
        # claimant landed — ownership gets re-evaluated against it), not a
        # failure; only attempts where NOTHING moved count toward giving
        # up (persistent FS trouble).
        stalled, last_seq = 0, -2
        while stalled < 5:
            epochs = self._epochs(fs, hpath)
            top_seq = epochs[-1][0] if epochs else -1
            stalled = 0 if top_seq > last_seq else stalled + 1
            last_seq = top_seq
            if epochs:
                seq, uri = epochs[-1]
                owner = self._owner(fs, hpath, uri)
                if owner == self.writer_id:
                    self._touch_heartbeat(fs, hpath)
                    return
                if owner is not None and not take_over:
                    if take_over_if_stale is not None and self._owner_stale(
                        fs, hpath, owner, uri, take_over_if_stale
                    ):
                        # Stale-owner self-heal: fall through to claim the
                        # next epoch, fencing the dead writer exactly like
                        # a manual take_over.
                        pass
                    else:
                        raise ConcurrentWriterError(
                            f"table at {self.dir.removesuffix('__writer')} "
                            f"is owned by writer {owner!r} (epoch {seq}); "
                            f"this writer is {self.writer_id!r}. A "
                            "concurrent read-merge-overwrite would "
                            "interleave as silent lost updates — if the "
                            "other writer is dead (crashed pipeline), "
                            "construct the table with take_over=True to "
                            "fence it and claim a new epoch, or pass "
                            "take_over_if_stale=<seconds> to self-heal "
                            "from owners with no recent heartbeat."
                        )
                elif owner is None and not take_over:
                    # Unresolved newest claim: either a concurrent acquire
                    # mid-fill (resolves in milliseconds) or a BURNED claim
                    # from a crashed takeover (never resolves). Don't race
                    # it and don't lock the legitimate owner out on first
                    # sight either — spin through the stall budget so an
                    # in-flight fill passes on the next listing, and only a
                    # provably stuck claim raises (below, with take_over
                    # guidance).
                    import time as _time

                    _time.sleep(0.05)
                    continue
                next_seq = seq + 1
            else:
                next_seq = 0
            if self._claim(fs, hpath, next_seq):
                # Retention: keep the new epoch + its predecessor (an
                # in-flight check against the old epoch resolves, then
                # fails loudly on the newer one at its next ensure).
                for s, uri in epochs[:-1]:
                    delete_commit(fs, hpath, self.dir, f"e{s:012d}", uri)
                self._touch_heartbeat(fs, hpath)
                return
            # Lost the claim race — re-list and re-evaluate ownership.
        raise ConcurrentWriterError(
            f"could not acquire the writer lease at {self.dir}: persistent "
            "claim races, or the newest epoch is an unresolved claim that "
            "never fills — a takeover that crashed between claim and fill. "
            "If no other writer is alive, construct the table with "
            "take_over=True to claim past it."
        )

    def check(self) -> None:
        """Post-write fencing probe: raise if a takeover landed while this
        writer's commit was in flight, so the fenced writer's pipeline
        dies loudly instead of continuing to publish over the new owner."""
        fs, hpath = self._fs()
        epochs = self._epochs(fs, hpath)
        if not epochs:
            return
        owner = self._owner(fs, hpath, epochs[-1][1])
        if owner is not None and owner != self.writer_id:
            raise ConcurrentWriterError(
                f"writer {self.writer_id!r} was fenced during a commit to "
                f"{self.dir.removesuffix('__writer')}: epoch "
                f"{epochs[-1][0]} now belongs to {owner!r}. This writer "
                "must stop; the in-flight commit may race the new owner's "
                "first write — re-run that writer's next batch."
            )


def save_bucketed(
    df: DataFrame,
    name: str,
    keys: Sequence[str],
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Bucketed, sorted, catalog-registered table — the co-located-join
    primitive. Two tables bucketed on the same keys with the same bucket
    count join WITHOUT a shuffle (and without a sort, if sorted): at 100 TB
    this turns the recurring fact⋈fact join from the dominant shuffle into
    a zipped per-bucket merge. Requires saveAsTable (bucket metadata lives
    in the catalog, not the parquet footers)."""
    # Drop any previous registration: with an in-memory catalog a table
    # from an earlier session survives only as files, and saveAsTable
    # refuses to reuse the managed location.
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {name}")
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.format("parquet").saveAsTable(name)


def hudi_available(spark: SparkSession) -> bool:
    """Probe for the Hudi DataSource (jar not shipped in this container)."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.hudi.DefaultSource")
        return True
    except Exception:
        return False


class KeyedTable:
    """A primary-keyed, upsertable parquet table at a fixed path.

    >>> t = KeyedTable(spark, "/data/customers", keys=["id"],
    ...                ordering=["_lsn"], partition_by=["region"])
    >>> t.upsert(change_batch)   # latest-wins + deletes, COW
    >>> t.register("customers")  # queryable by name
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: Sequence[str],
        ordering: Sequence[str] = ("_lsn",),
        partition_by: Sequence[str] = (),
        op_col: str | None = "op",
        keep_history: int = 0,
        merge_schema: bool = False,
        writer_id: str | None = None,
        take_over: bool = False,
        take_over_if_stale: float | None = None,
    ) -> None:
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.ordering = list(ordering)
        self.partition_by = list(partition_by)
        self.op_col = op_col
        #: Single-writer enforcement (WriterLease): every data commit
        #: checks the fencing epoch — a SECOND writer (default: another
        #: process; pass ``writer_id`` to scope finer) raises
        #: ConcurrentWriterError instead of interleaving lost updates.
        #: ``take_over=True`` claims a new epoch over a dead writer's.
        self._lease = WriterLease(spark, path, writer_id)
        self.take_over = take_over
        #: Standing self-heal policy (never one-shot, unlike take_over):
        #: fence an owner with no heartbeat for this many seconds — see
        #: WriterLease.ensure. None = manual-takeover-only (the default).
        self.take_over_if_stale = take_over_if_stale
        #: Legacy fallback knob, superseded by the schema SIDECAR: every
        #: init/upsert now persists the table's authoritative schema
        #: (``SchemaSidecar``) and ``read()`` applies it as the explicit
        #: parquet schema, so a PARTITIONED table that gained columns
        #: through reconciliation (B11) reads correctly with no knob — the
        #: old failure was footer-inference picking ONE arbitrary old
        #: footer and the drifted column vanishing (then being dropped
        #: permanently by the next partition rewrite). ``merge_schema``
        #: still governs PRE-SIDECAR tables (written before this existed):
        #: merge footers instead of inferring from one.
        self.merge_schema = merge_schema
        self.schema_sidecar = SchemaSidecar(spark, path)
        #: Hudi-timeline analogue (opt-in): with ``keep_history`` > 0 every
        #: init/upsert ALSO publishes an immutable full-snapshot commit
        #: under ``{path}__snapshots`` (one extra write per batch — the COW
        #: file-version retention Hudi pays too), and ``read(as_of=n)``
        #: time-travels to commit n. 0 = current behavior, no extra writes.
        self.keep_history = max(0, keep_history)

    def _ensure_lease(self) -> None:
        """Assert single-writer ownership, CONSUMING any takeover on the
        first success: ``take_over=True`` is a one-shot fencing action —
        left armed, two live writers both constructed with it would
        ping-pong epochs indefinitely and interleave read-merge-overwrite
        writes with no error (each re-taking the epoch before writing —
        exactly the silent lost-update pattern the lease exists to
        prevent). After consumption this writer is fenced like any other
        if a newer takeover lands. ``take_over_if_stale`` stays armed — it
        can only displace owners that stopped heartbeating, so it cannot
        ping-pong between live writers."""
        self._lease.ensure(self.take_over, self.take_over_if_stale)
        self.take_over = False

    # -- read ---------------------------------------------------------------

    def exists(self) -> bool:
        """True iff the table has readable data. Only the two MISSING/EMPTY
        conditions map to False — any other probe failure (transient FS
        error, permissions) RAISES: callers use this to decide between
        bootstrap-overwrite and merge, and treating a blip as "missing"
        would let an upsert wipe the table down to one batch. The probe is
        one short-circuited FS listing (fsutil.parquet_data_exists) — a
        corrupt FOOTER therefore surfaces loudly at the subsequent
        read/merge rather than here, which still can never route a caller
        to the bootstrap-overwrite branch."""
        from .fsutil import parquet_data_exists, recover_table_swap

        # Heal a torn stage-and-swap publish FIRST: a crash between the
        # swap's two renames leaves the table dir missing with the staged
        # table complete — without the roll-forward this probe would say
        # False and route the next upsert to bootstrap-overwrite, the
        # exact wipe hazard the narrow contract guards. One fs.exists in
        # the steady state.
        recover_table_swap(self.spark, self.path)
        return parquet_data_exists(self.spark, self.path)

    def read(self, as_of: int | None = None) -> DataFrame:
        """Current snapshot, or — with ``keep_history`` and ``as_of=n`` —
        the table exactly as of commit ``n`` (0 = init, then one commit
        per upsert), Hudi time-travel style.

        The current read applies the persisted sidecar schema when present
        (authoritative — stable column set/order regardless of which
        partitions were last rewritten); time-travel reads apply the
        schema-as-of EMBEDDED in the snapshot commit (``_schema.json``,
        written into the stage so commit and schema publish atomically) —
        pre-embed commits fall back to footer inference, which is safe
        for them because snapshot dirs are flat single-job writes."""
        from .fsutil import recover_table_swap

        # Same torn-swap heal as exists() (one fs.exists steady-state):
        # a reader of a crashed writer's table must see the rolled-forward
        # (or rolled-back) state, never a missing dir.
        recover_table_swap(self.spark, self.path)
        reader = self.spark.read
        if as_of is None:
            persisted = self.schema_sidecar.current()
            if persisted is not None:
                return reader.schema(persisted).parquet(self.path)
            if self.merge_schema:
                reader = reader.option("mergeSchema", "true")
            return reader.parquet(self.path)
        if self.merge_schema:
            reader = reader.option("mergeSchema", "true")
        for seq, uri in self.snapshots():
            if seq == as_of:
                persisted = _embedded_commit_schema(self.spark, uri)
                if persisted is not None:
                    # Schema-AS-OF, embedded in the commit itself: a
                    # pre-drift snapshot serves exactly its own columns
                    # (the current sidecar would wrongly widen it), and a
                    # snapshot of an emptied table (no footers) still
                    # reads. Pre-embed commits fall through to footer
                    # inference, the historical behavior.
                    return self.spark.read.schema(persisted).parquet(uri)
                return reader.parquet(uri)
        raise FileNotFoundError(
            f"no snapshot commit {as_of} at {self.path}__snapshots "
            f"(have {[s for s, _ in self.snapshots()]}; retention keeps "
            f"the last {self.keep_history})"
        )

    def _snapshot_commits(self) -> list[tuple[int, str | None]]:
        """(seq, content_uri) for every CLAIMED snapshot name, oldest
        first — content is None for an in-flight/burned pointer commit
        (see fsutil.pointer_commit), which publishers must count for seq
        allocation and readers must skip."""
        from .fsutil import hadoop_fs, list_commits

        fs, hpath = hadoop_fs(self.spark, self.path)
        out = []
        for name, content in list_commits(
            fs, hpath, self.spark, f"{self.path}__snapshots"
        ):
            if name.startswith("s") and name[1:].isdigit():
                out.append((int(name[1:]), content))
        out.sort()
        return out

    def snapshots(self) -> list[tuple[int, str]]:
        """Available (commit_seq, uri) snapshots, oldest first. Snapshot
        commits are FLAT parquet dirs, so any directory member is crash
        garbage from a torn rename_commit undo — healed here (one member
        listing per retained snapshot; keep_history bounds the count)
        before a time-travel read trips on conflicting structures."""
        from .fsutil import hadoop_fs, heal_nested_dirs

        fs, hpath = hadoop_fs(self.spark, self.path)
        out = []
        for seq, uri in self._snapshot_commits():
            if uri is not None:
                heal_nested_dirs(fs, hpath, uri)
                out.append((seq, uri))
        return out

    def _publish_snapshot(self, df: DataFrame) -> None:
        """One immutable snapshot commit per write (only when
        ``keep_history`` > 0): stage, rename into the timeline, trim to the
        newest ``keep_history`` commits — same protocol as
        streaming.rollup, same object-store-rename caveat.

        Contract (unchanged): every call site passes the table's CURRENT
        full content. On the staged-swap path that lets the stage be
        built by HARD-LINKING the just-published table's immutable parquet
        files — O(file count) metadata ops instead of a second full write
        per commit (the Hudi-timeline cost this used to pay); ``df`` then
        contributes only its schema (the embedded schema-as-of). Elsewhere
        (partitioned tables, object stores) the stage is written from
        ``df`` exactly as before."""
        if not self.keep_history:
            return
        if self._staged_swap():
            self._publish_snapshot_commit(
                self._stage_snapshot_links, df.schema
            )
        else:
            self._publish_snapshot_commit(
                lambda stage: df.write.mode("overwrite").parquet(stage),
                df.schema,
            )

    def _stage_snapshot_links(self, stage: str) -> None:
        """Populate one snapshot stage with hard links to the table's
        current visible files. Safe because data files are immutable: a
        later upsert RETIRES the whole table dir (unlinking its names)
        and publishes fresh uuid-staged files — the snapshot's links keep
        the old bytes alive, and retention's recursive delete only drops
        link counts. Only reached via ``_staged_swap`` (non-partitioned →
        the table dir is flat, matching the flat-snapshot contract that
        ``heal_nested_dirs`` enforces). Stores without link(2) fall back
        to an FS-level copy — still no plan re-execution."""
        import os as _os

        from .fsutil import _fs_is_local, _local_os_path, hadoop_fs

        fs, hpath = hadoop_fs(self.spark, self.path)
        fs.mkdirs(hpath(stage))
        src_os = _local_os_path(self.path) if _fs_is_local(fs) else None
        dst_os = _local_os_path(stage) if src_os is not None else None
        for st in fs.listStatus(hpath(self.path)):
            name = st.getPath().getName()
            if st.isDirectory() or name[:1] in ("_", "."):
                continue
            if src_os is not None and dst_os is not None:
                _os.link(
                    _os.path.join(src_os, name), _os.path.join(dst_os, name)
                )
            else:
                self.spark._jvm.org.apache.hadoop.fs.FileUtil.copy(
                    fs,
                    st.getPath(),
                    fs,
                    hpath(f"{stage}/{name}"),
                    False,
                    self.spark._jsc.hadoopConfiguration(),
                )

    def _publish_snapshot_commit(self, populate, schema) -> None:
        """The snapshot commit engine: stage (via ``populate``), embed the
        schema-as-of, CAS-publish into the timeline, trim retention."""
        import uuid as _uuid

        from .fsutil import delete_commit, hadoop_fs, publish_commit

        fs, hpath = hadoop_fs(self.spark, self.path)
        stage = f"{self.path}__stage/{_uuid.uuid4().hex}"
        populate(stage)
        # Schema-as-of rides INSIDE the commit (after the populate —
        # overwrite staging clears the dir): read(as_of=n) serves commit n
        # with commit n's own schema, not the current sidecar's.
        _embed_commit_schema(self.spark, stage, schema)
        fs.mkdirs(hpath(f"{self.path}__snapshots"))
        # Allocation counts BURNED pointer names too (content=None) — a
        # crash between claim and fill wastes a seq forever; reallocating
        # it would fail the CAS on every retry.
        existing = self._snapshot_commits()
        for _attempt in range(5):
            seq = existing[-1][0] + 1 if existing else 0
            if publish_commit(
                fs, hpath, stage, f"{self.path}__snapshots/s{seq:012d}"
            ):
                break
            # A concurrent writer took this seq (or the rename failed
            # transiently): re-stage if the attempt consumed the stage
            # (move-INTO undo), re-list, and retry with a fresh number
            # rather than silently losing the commit.
            if not fs.exists(hpath(stage)):
                populate(stage)
                _embed_commit_schema(self.spark, stage, schema)
            existing = self._snapshot_commits()
        else:
            fs.delete(hpath(stage), True)
            raise RuntimeError(
                f"could not publish snapshot commit at {self.path}__snapshots "
                "after 5 rename attempts"
            )
        # Retention windows over RESOLVED (readable) snapshots only — a
        # burned pointer name counted in the window would permanently
        # displace one readable historical snapshot (keep_history=2 with a
        # burned newest claim retained the burned name plus the new commit:
        # ONE readable snapshot instead of two). Burned names are GC'd
        # unconditionally, as compact() does for base versions; their seq
        # then frees for reallocation, which is safe — a burned claim was
        # never readable, so no as_of reader ever bound to it.
        resolved = [(s, uri) for s, uri in existing if uri is not None]
        keep = (
            {s for s, _ in resolved[-(self.keep_history - 1):]}
            if self.keep_history > 1
            else set()
        )
        for s, uri in existing:
            if s in keep:
                continue
            delete_commit(fs, hpath, f"{self.path}__snapshots", f"s{s:012d}", uri)
        # The staged dir was renamed away; drop its (now empty) parent.
        # Non-recursive delete refuses a non-empty dir, so a concurrent
        # writer's in-flight stage is never touched.
        try:
            fs.delete(hpath(f"{self.path}__stage"), False)
        except Exception:
            pass

    def register(self, name: str) -> None:
        """Catalog sync (B12). Locally a temp view; on a cluster this is
        where saveAsTable/Glue registration goes."""
        self.read().createOrReplaceTempView(name)

    # -- write --------------------------------------------------------------

    def _staged_swap(self) -> bool:
        """True iff full-table rewrites go through the stage-and-swap
        publish (write the merge ONCE into a staged dir, two atomic
        renames) instead of checkpoint + in-place overwrite (TWO full
        materializations per batch — the round-12 verdict's top remaining
        structural cost). Applicability:

        - non-partitioned only: the swap's atomicity unit is the whole
          table dir; partitioned tables keep the partition-pruned dynamic
          overwrite, whose whole point is NOT rewriting the full table.
        - rename commit protocol only (HDFS/local): object stores fake
          directory rename as copy+delete — there the in-place overwrite
          is no worse and the swap buys nothing."""
        from .fsutil import commit_protocol

        return not self.partition_by and commit_protocol(self.path) == "rename"

    def _write(self, df: DataFrame, mode: str) -> None:
        # The one COW data-commit choke point (init/upsert/compact/
        # compact_history all land here): assert single-writer ownership
        # BEFORE touching data — a concurrent writer raises instead of
        # interleaving read-merge-overwrite lost updates — and re-check
        # after, so a takeover that lands mid-write fences this writer
        # loudly rather than letting it keep publishing.
        self._ensure_lease()
        if mode == "overwrite" and self._staged_swap():
            # Stage-and-swap: compute df straight into a staged dir (ONE
            # materialization — no localCheckpoint pass, and df may read
            # the very files the swap replaces, since they are untouched
            # until the rename), then publish with two atomic renames
            # (fsutil.swap_table_dir; crash windows journaled + healed by
            # recover_table_swap). Halves the per-batch full-table work.
            import uuid as _uuid

            from .fsutil import swap_table_dir

            stage = f"{self.path}__stage/{_uuid.uuid4().hex}"
            df.write.mode("overwrite").parquet(stage)
            # Fenced writers must not PUBLISH: re-check between the
            # (invisible) stage write and the swap, so a takeover landing
            # mid-write raises with the table still on the old state.
            self._lease.check()
            swap_table_dir(self.spark, self.path, stage)
        else:
            writer = df.write.mode(mode)
            if self.partition_by:
                writer = writer.partitionBy(*self.partition_by)
            writer.parquet(self.path)
        self._lease.check()

    def _row_columns(self, changes: DataFrame) -> list[str]:
        """Data columns = change columns minus CDC metadata (op/ordering)."""
        from .operators.merge import cdc_meta_columns

        meta = cdc_meta_columns(self.op_col, self.ordering)
        return [c for c in changes.columns if c not in meta]

    def init(self, df: DataFrame) -> None:
        """Create/replace the table from a snapshot."""
        # Refuse up front (single-writer): a fenced writer must not even
        # widen the sidecar; _write re-checks as the last-line defense.
        self._ensure_lease()
        if self.keep_history and not self._staged_swap():
            # The snapshot publish re-executes this plan; materialize it
            # so a nondeterministic input (rand(), unordered limit,
            # equal-ordering precombine ties upstream) cannot publish a
            # snapshot that diverges from the table just written. On the
            # staged-swap path the snapshot is hard-linked from the files
            # the stage write materialized, so the plan never re-executes
            # — no checkpoint needed.
            df = df.localCheckpoint(eager=True)
        # Two-phase schema commit for a table REPLACE: widen the sidecar
        # to union(old, new) BEFORE the write, then RESET it to exactly
        # the new schema after the data lands. Both crash windows are then
        # harmless-wide (phantom columns null-fill): crash before the
        # write leaves the old data under a wider sidecar; crash after it
        # leaves the new data under the union — on a NARROWING replace
        # that union still holds the dropped column, and on a PARTITIONED
        # table the next upsert re-unions it and physically rewrites it
        # (all-NULL) into touched partitions: the dropped column is
        # resurrected permanently. Accepted tradeoff — a phantom all-NULL
        # column over silent data loss; non-partitioned tables self-heal
        # at their next upsert (full rewrite → reset, see upsert). The
        # earlier single
        # reset-after-write ordering had a stale-NARROW window — a crash
        # between write and publish on a WIDENING replace served the new
        # data through the old sidecar, projecting the new column out
        # (and the next upsert's rewrite made the loss permanent).
        self.schema_sidecar.publish(df.schema)
        self._write(df, "overwrite")
        self.schema_sidecar.publish(df.schema, reset=True)
        # Publish from the DF just written, NOT a re-read: an EMPTY
        # partitioned write leaves a footer-less dir that read() cannot
        # infer a schema from — the re-read crashed the write path on any
        # batch that emptied the table (found by tools/fuzz_cdc.py), and
        # eagerly evaluating read() as the argument crashed even with
        # keep_history=0 where the publish is a no-op.
        self._publish_snapshot(df)

    def upsert(self, changes: DataFrame) -> None:
        """Apply a CDC change batch (B5/B6/B8/B11).

        Without partitioning: full COW rewrite. With partitioning: only the
        partitions that contain changed keys are re-merged and rewritten
        (dynamic partition overwrite) — the rest of the table is untouched,
        which is the property that makes this viable at 100 TB. Like Hudi's
        non-global index, a key's partition value is assumed immutable.
        """
        from .operators.merge import latest_by_key

        # Refuse up front: no sidecar widening, no wasted merge compute,
        # for a commit the lease would reject at _write anyway.
        self._ensure_lease()
        if not self.exists():
            # Precombine BEFORE dropping deletes: a key whose newest change
            # in this first batch is a delete must not resurrect through an
            # older insert that the delete superseded (mixed-op initial
            # batches are normal when a whole change feed replays in one
            # micro-batch).
            latest = latest_by_key(changes, self.keys, self.ordering)
            if self.op_col and self.op_col in changes.columns:
                latest = latest.filter(F.col(self.op_col) != "d")
            bootstrap = latest.select(*self._row_columns(changes))
            if self.keep_history and not self._staged_swap():
                # Same materialize-before-publish contract as init(): the
                # publish re-executes the plan, and a precombine with
                # equal-ordering ties picks nondeterministically per
                # execution — the snapshot must be the rows the table
                # actually holds. (Staged swap: snapshot = hard links to
                # the written files; the plan never re-executes.)
                bootstrap = bootstrap.localCheckpoint(eager=True)
            # Bootstrap ≡ table replace: same two-phase schema commit as
            # init (widen before the write, reset after), so a crash on a
            # re-bootstrap of a previously-emptied table whose new feed is
            # WIDER than the old sidecar cannot serve the new data through
            # the stale-narrow schema. The reset matters for the narrowing
            # direction: the re-bootstrapped table reads on its new feed's
            # schema, not the dead table's.
            self.schema_sidecar.publish(bootstrap.schema)
            self._write(bootstrap, "overwrite")
            self.schema_sidecar.publish(bootstrap.schema, reset=True)
            # `bootstrap` IS the full table here — publish it directly
            # (see init: a re-read crashes when a first batch whose newest
            # changes are all deletes writes an empty, footer-less table).
            self._publish_snapshot(bootstrap)
            return

        current = self.read()
        if self.partition_by:
            # Partition-pruned COW: merge only partitions holding changed
            # keys. The semi-join broadcast is small (distinct partition
            # values of the change batch).
            parts = changes.select(*self.partition_by).distinct()
            current = current.join(F.broadcast(parts), self.partition_by, "left_semi")
        merged = merge_upsert(
            current, changes, self.keys, self.ordering, op_col=self.op_col
        )
        if not self._staged_swap():
            # In-place overwrite: the merge reads the files the write
            # replaces — break the lineage with a full materialization.
            # The staged swap needs neither: the merge computes straight
            # into the stage while its input files sit untouched, and the
            # snapshot (keep_history) hard-links the staged files instead
            # of re-executing the plan.
            merged = merged.localCheckpoint(eager=True)
        # WIDEN the sidecar before any data write: if the write fails
        # mid-way the sidecar is at worst wider than the files (null-fill,
        # harmless); writing drifted files first and crashing before the
        # publish would leave a stale-narrow sidecar that drops the new
        # column — the exact loss class this closes.
        self.schema_sidecar.publish(merged.schema)
        if self.partition_by:
            # Dynamic overwrite only replaces partitions PRESENT in the
            # output: a touched partition whose rows were all deleted would
            # survive as stale files. Detect with ONE distributed anti-join
            # over the (tiny, checkpointed) merged batch — not driver-side
            # collects — and fall back to a full rewrite for that (rare)
            # batch.
            vanished = parts.join(
                merged.select(*self.partition_by).distinct(),
                self.partition_by,
                "left_anti",
            )
            if not vanished.isEmpty():
                untouched = self.read().join(
                    F.broadcast(parts), self.partition_by, "left_anti"
                )
                # allowMissingColumns: when the batch that emptied a
                # partition ALSO carries schema drift, `merged` has the
                # new column but the untouched partitions (all still on
                # the old schema — nothing is rewritten yet) do not; a
                # strict unionByName crashed this fallback with
                # NUM_COLUMNS_MISMATCH (found by tools/fuzz_cdc.py).
                # Old rows null-fill, matching merge_upsert's own B11
                # reconciliation.
                merged = untouched.unionByName(
                    merged, allowMissingColumns=True
                ).localCheckpoint(eager=True)
                self.spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", "static"
                )
                try:
                    self._write(merged, "overwrite")
                finally:
                    self.spark.conf.set(
                        "spark.sql.sources.partitionOverwriteMode", "dynamic"
                    )
                # The static rewrite's `merged` is untouched ∪ merged —
                # the full table; publishing it directly survives the
                # all-rows-deleted batch (empty write = no footers to
                # re-read) that crashed the re-read form.
                self._publish_snapshot(merged)
                return
        self._write(merged, "overwrite")
        if not self.partition_by:
            # Opportunistic reconcile: this was a FULL rewrite, so the
            # files' schema is provably exactly `merged.schema` — reset the
            # sidecar to it, retiring any phantom-wide columns left by a
            # crashed NARROWING replace (crash between init's _write and
            # its reset leaves the union sidecar holding the dropped
            # column; without this, the next upsert re-unions and rewrites
            # it as all-NULL forever). PARTITIONED tables cannot do this —
            # untouched partitions were not rewritten, so narrowing the
            # sidecar to the merge output would reopen the vanishing-column
            # hole; there the wide-over-narrow outcome is permanent by
            # design (documented tradeoff: a phantom all-NULL column over
            # silent data loss).
            self.schema_sidecar.publish(merged.schema, reset=True)
        if self.partition_by:
            # Dynamic partial overwrite: `merged` holds only the touched
            # partitions, so the snapshot must re-read the full table.
            # Safe here by construction: this branch requires merged to
            # cover every touched partition (the vanished check above), so
            # the table has at least merged's footers. keep_history guard
            # keeps the read()'s footer-inference off the keep_history=0
            # hot path.
            if self.keep_history:
                self._publish_snapshot(self.read())
        else:
            self._publish_snapshot(merged)

    def compact(
        self,
        target_partitions: int | None = None,
        cluster_by: Sequence[str] | None = None,
    ) -> None:
        """Small-file compaction, optionally WITH data clustering. Per-
        micro-batch CDC writes accrete small files (one per task per
        batch) — the classic streaming-table decay; Hudi runs this as an
        inline/async table service, and its clustering service is the
        same rewrite with a sort. ``cluster_by``: one column → range-
        partition + sort on it (row-group skipping on that predicate
        column); two columns → Morton/Z-order interleave (the
        hoodie.clustering layout-optimize strategy), giving narrow
        row-group min/max stats in BOTH dimensions at once. Bits are
        sized from the column maxima so large keys keep their locality
        (fixed-width slices silently collapse the curve)."""
        current = self.read()
        if not self._staged_swap():
            # In-place overwrite reads the files it replaces — break the
            # lineage. The staged swap leaves them untouched until the
            # rename, so the compaction is one pass, not two.
            current = current.localCheckpoint(eager=True)
        n_out = target_partitions or int(
            self.spark.conf.get("spark.sql.shuffle.partitions")
        )
        if cluster_by:
            cluster_by = list(cluster_by)
            if len(cluster_by) == 1:
                out = current.repartitionByRange(
                    n_out, cluster_by[0]
                ).sortWithinPartitions(cluster_by[0])
            elif len(cluster_by) == 2:
                from .functions import adaptive_zorder_bits, zorder_key

                x, y = (F.col(c) for c in cluster_by)
                bits = adaptive_zorder_bits(current, *cluster_by)
                out = (
                    current.withColumn("__z", zorder_key(x, y, bits))
                    .repartitionByRange(n_out, "__z")
                    .sortWithinPartitions("__z")
                    .drop("__z")
                )
            else:
                raise ValueError("cluster_by supports 1 (sort) or 2 (Z-order) columns")
        else:
            out = current.repartition(n_out)
        self._write(out, "overwrite")

    def compact_history(self, history: DataFrame) -> None:
        """Bootstrap from a full change history (B13 earliest replay):
        one global latest-wins pass instead of per-batch merges."""
        self._ensure_lease()
        empty = self.spark.createDataFrame(
            [], history.select(*self._row_columns(history)).schema
        )
        merged = merge_upsert(empty, history, self.keys, self.ordering, self.op_col)
        # Table replace: two-phase schema commit (see init) — widen first
        # so no crash window serves WIDE data under a NARROW sidecar.
        self.schema_sidecar.publish(merged.schema)
        self._write(merged, "overwrite")
        self.schema_sidecar.publish(merged.schema, reset=True)


class DeltaLogTable:
    """MERGE_ON_READ counterpart to ``KeyedTable`` (Hudi's other table type,
    ``hoodie.datasource.write.table.type`` — the reference picks
    COPY_ON_WRITE, README.md:300; this completes the axis).

    Write path: ``append_changes`` lands each change batch as an immutable
    ``delta/ingest_batch=<id>`` directory — O(batch) per micro-batch, no
    table rewrite (the write-amplification COW pays is deferred). Read
    path: latest-wins merge of base ∪ deltas computed AT READ TIME, with
    delta precedence by (batch id, ordering). ``compact`` folds the delta
    log into the base snapshot (Hudi's compaction table service) so read
    cost stays bounded by compaction cadence.

    The trade is exactly Hudi's: COW = slow write / fast read, MOR = fast
    write / merge-on-read. At 100 TB the delta dirs are also the
    incremental-pull surface (``read_incremental`` here, mirroring
    streaming.pipeline.incremental_read's directory pruning).

    ``auto_compact_deltas``: when set, ``append_changes`` triggers
    ``compact()`` once the delta log reaches that many batch directories —
    Hudi's inline-compaction trigger (``hoodie.compact.inline.max.delta.
    commits``). Bounds merge-on-read cost by compaction cadence without an
    external table service.

    ``async_compact``: run that triggered compaction on a background
    thread instead of blocking the ingest path — Hudi's async-compaction
    deployment (``hoodie.compact.inline=false`` + the async table
    service), the production answer to the inline-compaction latency
    spike (p95 4.8 s → sub-second on tools/stream_latency.py because the
    write path only ever pays the O(batch) delta append). Safe by the
    same contracts ``compact()`` already pins for racing appends and
    racing compactions (CAS publish, deferred retirement); single-flight
    per table path, so a slow compaction is never stacked. A compaction
    killed mid-run (process exit) leaves only an unpublished __stage dir
    and re-runs at the next trigger."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: Sequence[str],
        ordering: Sequence[str] = ("_lsn",),
        op_col: str | None = "op",
        auto_compact_deltas: int | None = None,
        compact_target_files: int | None = None,
        async_compact: bool = False,
        merge_schema: bool = False,
        writer_id: str | None = None,
        take_over: bool = False,
        take_over_if_stale: float | None = None,
    ) -> None:
        self.spark = spark
        self.path = path
        #: Single-writer enforcement on the INGEST path (append_changes):
        #: same WriterLease contract as KeyedTable. ``compact()`` is NOT
        #: lease-guarded by design — it is a table SERVICE (Hudi's offline
        #: compactor runs in its own process legitimately) and its own
        #: version-name CAS + deferred retirement already make racing
        #: compactions safe.
        self._lease = WriterLease(spark, path, writer_id)
        self.take_over = take_over
        #: Standing stale-owner self-heal (see WriterLease.ensure).
        self.take_over_if_stale = take_over_if_stale
        self.keys = list(keys)
        self.ordering = list(ordering)
        self.op_col = op_col
        self.auto_compact_deltas = auto_compact_deltas
        self.compact_target_files = compact_target_files
        self.async_compact = async_compact
        #: Read the DELTA LOG with parquet schema merging — required when
        #: change batches can gain columns (B11 schema drift): the delta
        #: dir holds one directory per batch, each with its own footer
        #: schema, and WITHOUT merging Spark infers the union read's
        #: schema from ONE arbitrary footer, so a drifted column
        #: nondeterministically VANISHES from the merge-on-read view (and
        #: from the next compaction's folded base — permanent loss). The
        #: COW sibling (KeyedTable.merge_schema) has the same knob for
        #: the same reason; both default off because the footer-read cost
        #: is per file and stable-schema feeds shouldn't pay it. The base
        #: snapshot never needs merging (each version is written by one
        #: job with one schema); base ∪ delta reconciliation is handled
        #: by merge_upsert's unionByName.
        #:
        #: Like the COW sibling, this knob is now the PRE-SIDECAR fallback:
        #: ``append_changes`` persists the delta log's authoritative schema
        #: (union of every appended batch's schema) and delta reads apply
        #: it explicitly, so drifted columns survive with the knob off.
        self.merge_schema = merge_schema
        self.delta_schema_sidecar = SchemaSidecar(spark, f"{path}/delta")

    def _ensure_lease(self) -> None:
        """Single-writer assert with one-shot takeover consumption — same
        contract as KeyedTable._ensure_lease (see its docstring)."""
        self._lease.ensure(self.take_over, self.take_over_if_stale)
        self.take_over = False

    def _base(self) -> str:
        # Legacy (pre-MVCC) single-dir base layout; still readable.
        return f"{self.path}/base"

    def _base_commits_dir(self) -> str:
        return f"{self.path}/base__commits"

    def _delta(self) -> str:
        return f"{self.path}/delta"

    def _base_commits(self) -> list[tuple[int, int, str | None]]:
        """Every CLAIMED base-version name as (seq, compacted_through,
        content_uri), seq-ascending; content is None for an in-flight or
        burned pointer commit (fsutil.pointer_commit) — such a version was
        never published (its deltas were never retired), so readers skip it
        and only seq ALLOCATION counts it. One directory listing plus one
        small-file read per pointer."""
        import re as _re

        from .fsutil import list_commits

        fs, hpath = self._fs()
        out = []
        for name, content in list_commits(
            fs, hpath, self.spark, self._base_commits_dir()
        ):
            m = _re.match(r"^v(\d{12})_t(\d{12})$", name)
            if m:
                out.append((int(m.group(1)), int(m.group(2)) - 1, content))
        out.sort()
        return out

    def _base_versions(self) -> list[tuple[int, int, str]]:
        """Published (readable) base versions as (seq, compacted_through,
        uri), seq-ascending."""
        return [
            (seq, through, uri)
            for seq, through, uri in self._base_commits()
            if uri is not None
        ]

    def _latest_base(self) -> tuple[int, int, str] | None:
        """Newest base version, falling back to the legacy ``base/`` dir
        (treated as version -1 compacted through every batch id below the
        smallest live delta — i.e. deltas on disk all apply)."""
        versions = self._base_versions()
        if versions:
            return versions[-1]
        fs, hpath = self._fs()
        try:
            if fs.exists(hpath(self._base())):
                return (-1, -1, self._base())
        except Exception:
            pass
        return None

    def _delta_read_schema(self) -> T.StructType | None:
        """Explicit read schema for the delta log: the persisted sidecar
        union plus the ``ingest_batch`` partition column (resolved from
        the directory names). None when no sidecar exists (pre-sidecar
        table) — callers fall back to footer inference/merging."""
        cur = self.delta_schema_sidecar.current()
        if cur is None:
            return None
        return T.StructType(
            [f for f in cur.fields if f.name != "ingest_batch"]
            + [T.StructField("ingest_batch", T.IntegerType())]
        )

    def _read_dir(
        self,
        p: str,
        strict: bool = False,
        merge: bool = False,
        schema: T.StructType | None = None,
    ) -> DataFrame | None:
        """``strict`` distinguishes MISSING (→ None) from BROKEN (→ raise):
        the compaction path must never treat a transient read failure as
        an empty directory — swallowing it would publish a base whose
        version name claims deltas it silently dropped, and the
        ``ingest_batch > through`` filter would mask those committed rows
        forever (the same missing-vs-broken probe the COW upsert uses).
        ``schema``: explicit read schema (the sidecar path — authoritative,
        stable under drift). ``merge``: parquet schema merging, the
        pre-sidecar fallback for delta-log reads under ``merge_schema``."""
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        elif merge:
            reader = reader.option("mergeSchema", "true")
        if strict:
            fs, hpath = self._fs()
            if not fs.exists(hpath(p)):
                return None
            return reader.parquet(p)
        try:
            return reader.parquet(p)
        except Exception:
            return None

    def _fs(self):
        from .fsutil import hadoop_fs

        return hadoop_fs(self.spark, self.path)

    def delta_batches(self, committed_only: bool = False) -> list[int]:
        """Batch ids currently in the delta log (one FS listing — cheap;
        compaction retires them).

        ``committed_only`` keeps only dirs carrying the ``_SUCCESS`` job
        marker. Required by the ASYNC compaction path: the ingest thread's
        parquet write creates ``ingest_batch=N`` at job SETUP, so a raw
        listing taken from the compaction thread can see a batch whose
        files have not committed yet — folding it would publish a base
        "compacted through N" over zero/partial rows and the delta filter
        in ``read`` would then mask N's committed rows forever. The marker
        flips the dir from invisible to foldable atomically at job commit
        (and an in-place replay overwrite deletes it first, hiding the dir
        again for the overwrite's duration)."""
        fs, hpath = self._fs()
        try:
            listed = fs.listStatus(hpath(self._delta()))
        except Exception:
            return []
        all_ids, committed = [], []
        for s in listed:
            name = s.getPath().getName()
            if not name.startswith("ingest_batch="):
                continue
            bid = int(name.split("=", 1)[1])
            all_ids.append(bid)
            if committed_only and fs.exists(
                hpath(f"{self._delta()}/{name}/_SUCCESS")
            ):
                committed.append(bid)
        if not committed_only:
            return sorted(all_ids)
        if all_ids and not committed:
            # No dir carries the marker. Either every dir is in-flight
            # (marker convention active — exclude them all) or the
            # deployment disables marksuccessfuljobs (common on object
            # stores) and filtering would make compaction silently inert
            # forever. Disambiguate via the base-version dirs: they are
            # written by the same committer, so a marker there proves the
            # convention is active. With no evidence of markers anywhere,
            # degrade to the raw listing (pre-guard behavior) and say so
            # once — on such deployments the torn-batch guard needs the
            # table-format commit log (README "Deploying outside this
            # container").
            #
            # Known hole in this inference (accepted): before the FIRST
            # compaction there is no base version to probe, so a moment
            # where every pending dir is simultaneously marker-less (all
            # in-flight) is indistinguishable from a markerless committer
            # and folds an in-flight batch. Reaching it requires
            # auto_compact_deltas=1 (compact fires while the only batch
            # ever written is still mid-write — at the default threshold
            # >= 2 some SIBLING batch has already committed and carries
            # the marker) or a manual compact() racing the first-ever
            # batch. Deployments that need the guard airtight from batch
            # zero should write the base version first (an empty
            # overwrite() bootstraps the marker probe).
            versions = self._base_versions()
            if versions and fs.exists(hpath(f"{versions[-1][2]}/_SUCCESS")):
                return []
            if self.path not in DeltaLogTable._MARKERLESS_WARNED:
                DeltaLogTable._MARKERLESS_WARNED.add(self.path)
                print(
                    f"[mor-compact] no _SUCCESS markers found under "
                    f"{self._delta()}: committed-batch detection degraded "
                    "to the raw listing (set "
                    "mapreduce.fileoutputcommitter.marksuccessfuljobs=true "
                    "or use a table-format commit log for the async "
                    "torn-batch guard)",
                    file=sys.stderr,
                )
            return sorted(all_ids)
        return sorted(committed)

    def _write_delta(self, changes: DataFrame, batch_id: int) -> None:
        """Land one delta dir — the only data write in the append path
        (idempotent per batch id: a replay overwrites its own directory).
        A named seam so crash-injection tests can kill the commit between
        the schema publish and the data landing."""
        self._ensure_lease()
        changes.write.mode("overwrite").parquet(
            f"{self._delta()}/ingest_batch={batch_id}"
        )
        self._lease.check()

    def append_changes(self, changes: DataFrame, batch_id: int) -> None:
        """Land one change batch (idempotent per batch id: a replay
        overwrites its own directory, the append-sink contract). May
        trigger inline compaction (``auto_compact_deltas``) — safe under
        replay: a re-landed batch's changes are latest-wins idempotent
        against a base that already folded them."""
        # Refuse up front (single-writer ingest): a fenced writer must not
        # even widen the delta sidecar; _write_delta re-checks.
        self._ensure_lease()
        # Widen the sidecar BEFORE the append (same crash-ordering
        # rationale as KeyedTable.upsert's publish-before-write): a
        # drifted batch on disk under a stale-narrow sidecar would vanish
        # the new column from the merge-on-read view — and from the next
        # compaction's folded base, permanently.
        self.delta_schema_sidecar.publish(changes.schema)
        self._write_delta(changes, batch_id)
        if self.auto_compact_deltas:
            ver = self._latest_base()
            through = ver[1] if ver else -1
            # Count only UNFOLDED dirs: retirement is deferred one cycle,
            # so already-compacted dirs may linger and must not re-trigger.
            pending = [b for b in self.delta_batches() if b > through]
            if len(pending) >= self.auto_compact_deltas:
                if self.async_compact:
                    self._spawn_async_compaction()
                else:
                    self.compact()

    # Single-flight async compaction registry: one live compaction thread
    # per table path across ALL DeltaLogTable instances (foreachBatch
    # constructs a fresh instance per micro-batch). _ASYNC_ERRORS holds
    # the last failure per path — a daemon thread has nowhere to raise.
    _ASYNC_LOCK = threading.Lock()
    _ASYNC_THREADS: dict[str, threading.Thread] = {}
    _ASYNC_ERRORS: dict[str, BaseException] = {}
    #: paths already warned about a marker-less committer (once per proc).
    _MARKERLESS_WARNED: set[str] = set()

    def _spawn_async_compaction(self) -> None:
        def run() -> None:
            # The table service semantics (Hudi async compactor): a failed
            # attempt is logged and retried at the next trigger, it never
            # fails the ingest stream. compact() cleans its own stage dir
            # on any exit path, so a deterministic failure retries without
            # accumulating snapshot-sized garbage.
            try:
                self.compact()
                with DeltaLogTable._ASYNC_LOCK:
                    DeltaLogTable._ASYNC_ERRORS.pop(self.path, None)
            except BaseException as e:  # noqa: BLE001 — must not die silent
                with DeltaLogTable._ASYNC_LOCK:
                    DeltaLogTable._ASYNC_ERRORS[self.path] = e
                print(
                    f"[mor-compact] async compaction failed for {self.path}: "
                    f"{type(e).__name__}: {e}",
                    file=sys.stderr,
                )

        with DeltaLogTable._ASYNC_LOCK:
            t = DeltaLogTable._ASYNC_THREADS.get(self.path)
            if t is not None and t.is_alive():
                return  # one in flight — the next trigger catches up
            t = threading.Thread(
                target=run, name=f"mor-compact:{self.path}", daemon=True
            )
            DeltaLogTable._ASYNC_THREADS[self.path] = t
            t.start()

    def last_compaction_error(self) -> BaseException | None:
        """Most recent ASYNC compaction failure for this path (cleared by
        the next successful run). Monitoring hook: the service retries
        per-trigger, but a deterministic failure shows up here while
        deltas accumulate."""
        with DeltaLogTable._ASYNC_LOCK:
            return DeltaLogTable._ASYNC_ERRORS.get(self.path)

    def await_compaction(self, timeout: float | None = None) -> None:
        """Join any in-flight async compaction for this path (tests and
        orderly shutdown; production leaves the service free-running)."""
        t = DeltaLogTable._ASYNC_THREADS.get(self.path)
        if t is not None and t.is_alive():
            t.join(timeout)

    def base_versions(self) -> list[int]:
        """Published compaction version seqs, oldest first (retention
        keeps the two newest — the MOR time-travel window)."""
        return [seq for seq, _, _ in self._base_versions()]

    def read_version(self, seq: int) -> DataFrame:
        """Time travel on the MOR axis (the COW sibling is
        ``KeyedTable.read(as_of=...)``): serve a specific PUBLISHED
        compaction version's base as-of its compacted-through batch — no
        later deltas applied, so the result is exactly the table state the
        moment that compaction folded. Retention bounds the window to the
        two newest versions (an in-flight-reader guarantee doubling as
        history), mirroring Hudi's cleaner-retained commits."""
        for s, _, uri in self._base_versions():
            if s == seq:
                # Schema-as-of embedded at compaction time (falls back to
                # footer inference for pre-embed versions): a pre-drift
                # version serves exactly its own columns.
                df = self._read_dir(
                    uri, schema=_embedded_commit_schema(self.spark, uri)
                )
                if df is None:
                    # Listed but unreadable: a concurrent compaction's
                    # retention pass deleted the dir between the listing
                    # and this read — surface the window error, not None.
                    break
                return df
        raise FileNotFoundError(
            f"no base version {seq} at {self.path} "
            f"(have {self.base_versions()}; retention keeps the 2 newest)"
        )

    def read(
        self,
        optimized: bool = False,
        _upper_batch: int | None = None,
        _strict: bool = False,
    ) -> DataFrame:
        """Merge-on-read snapshot: base patched with the delta log.

        Delta precedence is (ingest_batch, *ordering) — equivalent to
        replaying the batches in id order with each batch's own
        latest-wins dedup, because ``merge_upsert`` gives changes priority
        over the base and the prefixed ordering ranks across batches.

        ``optimized=True`` is Hudi's READ-OPTIMIZED query type: serve the
        compacted BASE only — parquet-scan cost with zero merge work, at
        the price of staleness bounded by compaction cadence (deltas
        landed since the last ``compact()`` are not visible). The
        dashboard/reporting lane next to the exact snapshot lane."""
        ver = self._latest_base()
        base = (
            self._read_dir(
                ver[2],
                strict=_strict,
                schema=_embedded_commit_schema(self.spark, ver[2]),
            )
            if ver
            else None
        )
        through = ver[1] if ver else -1
        if optimized:
            if base is None:
                raise FileNotFoundError(
                    f"read-optimized view of {self.path} requires a compacted "
                    "base (run compact() first)"
                )
            return base
        deltas = self._read_dir(
            self._delta(),
            strict=_strict,
            merge=self.merge_schema,
            schema=self._delta_read_schema(),
        )
        if deltas is not None and through >= 0:
            # A version records the batch id it compacted THROUGH; delta
            # dirs at or below it are already folded into this base (they
            # are retired after publish, but a reader can land between the
            # rename and the retire — or a replayed batch can recreate a
            # retired dir — and must not re-apply them).
            deltas = deltas.filter(F.col("ingest_batch") > through)
        if deltas is not None and _upper_batch is not None:
            # compact() pins its snapshot to the delta listing it is about
            # to record as compacted-through: a batch that lands DURING
            # the merge must stay out of the published version, or
            # read_version would serve history containing a batch the
            # version name disclaims.
            deltas = deltas.filter(F.col("ingest_batch") <= _upper_batch)
        if deltas is None:
            if base is None:
                raise FileNotFoundError(f"empty MOR table at {self.path}")
            return base
        # Strip the same CDC metadata set as KeyedTable._row_columns (plus
        # the MOR-only ingest_batch) so the COW and MOR variants of one feed
        # agree on the table schema — with ordering=("_lsn",) a batch that
        # happens to carry _ts_ms must not promote it to a data column.
        meta = cdc_meta_columns(self.op_col, self.ordering) | {"ingest_batch"}
        row_cols = [c for c in deltas.columns if c not in meta]
        if base is None:
            base = self.spark.createDataFrame([], deltas.select(*row_cols).schema)
        return merge_upsert(
            base,
            deltas,
            self.keys,
            ["ingest_batch", *self.ordering],
            op_col=self.op_col,
        )

    def read_incremental(self, since_batch: int) -> DataFrame:
        """Changes landed AFTER ``since_batch`` — the MOR incremental-pull
        surface (Hudi incremental query on a MOR table). The filter on the
        ``ingest_batch`` partition column prunes at the DIRECTORY level
        (PartitionFilters in the plan, pinned in tests/test_plans.py):
        pre-checkpoint delta dirs are never even listed, so an incremental
        consumer's scan cost is O(new batches), not O(log). History is
        bounded by compaction cadence — compaction retires delta dirs, so
        consumers must keep ``since_batch`` within the uncompacted window
        (exactly Hudi's incremental-read-vs-cleaner contract)."""
        deltas = self._read_dir(
            self._delta(),
            merge=self.merge_schema,
            schema=self._delta_read_schema(),
        )
        if deltas is None:
            raise FileNotFoundError(
                f"no delta log at {self.path} (compacted or empty table)"
            )
        return deltas.filter(F.col("ingest_batch") > since_batch)

    def compact(self) -> None:
        """Fold the delta log into a NEW base version (Hudi compaction as
        MVCC): merge base ∪ deltas, stage the snapshot, publish it with
        one atomic rename whose name records (seq, compacted-through batch
        id), then retire only the delta dirs AT OR BELOW that id.

        Concurrency contract this buys (pinned by tests):
        - a batch appended while the merge runs has id > through, is never
          retired by this compaction, and stays visible via the delta
          filter in ``read`` — no lost deltas (the previous in-place
          overwrite deleted the WHOLE delta dir, racing appends away);
        - an in-flight reader planned against the previous version keeps
          scanning immutable files: the two newest base versions are
          retained, and delta retirement is DEFERRED one cycle — this
          compaction retires only dirs the PREVIOUS version had already
          folded (our own window stays on disk, invisible to new readers
          via the partition filter, until the next compaction) — Hudi's
          cleaner-retains-commits contract;
        - two racing compactions CAS on the version name — the loser
          discards its stage and nothing is retired twice.

        ``compact_target_files`` bounds the new version's file count
        (small-file control: a merge at the session's shuffle fan-out
        would leave one sliver file per partition).

        Cross-process compactor races (round 12, found by the real
        two-process hunt): TWO compaction services on one table advance
        the version timeline twice as fast, so one service's in-flight
        merge can scan a delta dir the other's NEXT cycle just retired —
        the strict read then fails with FAILED_READ_FILE (never a
        silently row-short snapshot; see the ignoreMissingFiles pin
        below). That failure means the OTHER compactor folded those very
        deltas into a newer published version — progress, not damage — so
        this method retries the whole plan against the fresh timeline a
        bounded number of times and usually returns on the
        nothing-left-to-fold early exit. Any other failure, and the last
        retry, still raise."""
        for attempt in range(3):
            try:
                return self._compact_once()
            except Exception as e:
                msg = str(e)
                lost_inputs = (
                    "FAILED_READ_FILE" in msg or "FileNotFoundException" in msg
                ) and self.path in msg
                if not lost_inputs or attempt == 2:
                    raise
        return None

    def _compact_once(self) -> None:
        """One compaction attempt — see ``compact`` for the contract."""
        import uuid as _uuid

        from .fsutil import publish_commit

        # The fail-safe story below leans on strict scans RAISING when a
        # racing (out-of-process) compaction retires a file between this
        # listing and the stage write. spark.sql.files.ignoreMissingFiles
        # =true would turn that raise into a silently row-short published
        # base — assert the conf here so the property is pinned, not
        # assumed (it is false by default; a deployment flipping it
        # globally must scope it away from compaction).
        if (
            self.spark.conf.get("spark.sql.files.ignoreMissingFiles", "false")
            == "true"
        ):
            raise RuntimeError(
                "compact() requires spark.sql.files.ignoreMissingFiles=false: "
                "with it true, a compaction racing another process's "
                "retirement would publish a base snapshot missing rows "
                "instead of failing and retrying"
            )

        fs, hpath = self._fs()
        # committed_only: under the async service this listing races the
        # ingest thread's in-flight parquet job — see delta_batches.
        batches = self.delta_batches(committed_only=True)
        if not batches:
            return
        through = max(batches)
        versions = self._base_versions()
        # Heal crash garbage (a torn rename_commit undo nests the loser's
        # stage inside the winner's version dir — see
        # fsutil.heal_nested_dirs). Done here, not in _base_versions: reads
        # are hot and pin a one-listing contract; compaction is rare and
        # already walking the timeline.
        from .fsutil import heal_nested_dirs

        for _, _, uri in versions:
            heal_nested_dirs(fs, hpath, uri)
        if versions and through <= versions[-1][1]:
            return  # every live delta dir is already folded — nothing to do
        # Allocate past every CLAIMED name, burned pointers included — a
        # crash between pointer claim and fill wastes that seq forever.
        commits = self._base_commits()
        seq = commits[-1][0] + 1 if commits else 0
        # read() applies exactly the deltas newer than the current base
        # version, UPPER-BOUNDED at the listing this compaction records as
        # compacted-through — a batch appended while the merge runs stays
        # OUT of the published snapshot (it remains a live delta), keeping
        # read_version's "no later deltas" contract exact under the race.
        # No extra materialization barrier is needed before publishing:
        # the stage-write below fully computes the snapshot BEFORE the
        # rename publish and the retirement pass, our own retirement only
        # touches dirs ≤ prev_through (which this plan never scans — read
        # applies deltas strictly newer than the current base), and a
        # racing compaction's retention keeps the base version this plan
        # reads (two-newest rule). The former eager localCheckpoint here
        # computed the whole merge twice per compaction.
        # _strict: a transient read failure must RAISE (async service
        # retries next trigger), never collapse to "no base"/"no deltas" —
        # publishing from a silently-partial read is permanent data loss.
        merged = self.read(_upper_batch=through, _strict=True)
        if self.compact_target_files:
            merged = merged.coalesce(self.compact_target_files)
        stage = f"{self.path}/__stage/{_uuid.uuid4().hex}"
        try:
            merged.write.mode("overwrite").parquet(stage)
            # Schema-as-of rides inside the version commit (read_version
            # applies it; see _embedded_commit_schema).
            _embed_commit_schema(self.spark, stage, merged.schema)
            fs.mkdirs(hpath(self._base_commits_dir()))
            target = f"{self._base_commits_dir()}/v{seq:012d}_t{through + 1:012d}"
            published = publish_commit(fs, hpath, stage, target)
        except BaseException:
            # A failed stage write is a full-table snapshot of garbage —
            # without this cleanup a deterministically-failing ASYNC
            # service would leak one per trigger, forever.
            try:
                fs.delete(hpath(stage), True)
            except Exception:
                pass
            raise
        if not published:
            # Lost the race to a concurrent compaction; its snapshot folds
            # the same (or more) deltas. Drop ours and do not retire.
            fs.delete(hpath(stage), True)
            return
        prev_through = versions[-1][1] if versions else -1
        # Retire from the RAW listing: any dir ≤ prev_through was folded
        # by the previous version whether or not its _SUCCESS marker still
        # exists (read() applies no marker filter) — retiring only the
        # committed-only listing would leak a marker-stripped dir forever.
        for b in self.delta_batches():
            if b > prev_through:
                continue  # deferred: retired by the NEXT compaction
            try:
                fs.delete(hpath(f"{self._delta()}/ingest_batch={b}"), True)
            except Exception:
                pass
        # Retention: keep the two newest versions (in-flight readers of the
        # previous one finish on immutable files) + drop the legacy dir.
        # Walk the CLAIMED list so burned pointer names get GC'd too; the
        # previous newest RESOLVED version is the one retained.
        from .fsutil import delete_commit

        # keep_uri from the COMMITS listing (the freshest one we hold), not
        # the earlier `versions` listing: a concurrent compaction's version
        # published between the two listings is in `commits` but not in
        # `versions` — keying retention off the stale list would delete it
        # moments after it was published, failing an in-flight reader that
        # just resolved it (violating the keep-two-newest rule).
        resolved_commits = [u for _, _, u in commits if u is not None]
        keep_uri = resolved_commits[-1] if resolved_commits else None
        for s, t, uri in commits:
            if uri is not None and uri == keep_uri:
                continue
            delete_commit(
                fs,
                hpath,
                self._base_commits_dir(),
                f"v{s:012d}_t{t + 1:012d}",
                uri,
            )
        try:
            fs.delete(hpath(self._base()), True)
        except Exception:
            pass
