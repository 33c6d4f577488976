"""Custom Python Data Source (Spark 4 DataSource API) for NMEA lines.

The reference's only ingest is a per-line push call
(``ParseLine``, class.nmea.parser.php:103-114). Spark's idiomatic
equivalent of "my data arrives via custom code" is a DataSource V2
implementation — since Spark 4 writable in pure Python
(pyspark.sql.datasource) — so the engine ships one: a deterministic
NMEA sentence source, partitioned per track, readable as

    spark.read.format("nmea_fixture").option("n_tracks", 3).load()

Scale notes: ``partitions()`` declares one InputPartition per track, so
a cluster reads tracks in parallel exactly like a directory of
per-receiver files. The fixture generator is a single sequential RNG
stream (FIXTURES.md §A.1 pins byte-identical output), so the split is
done ONCE, driver-side, at planning time: ``partitions()`` generates
the stream and ships each InputPartition only its own track's rows
(the same place Spark's own in-memory sources carry their data).
Total work is O(N) and each task deserializes + yields only its slice
— previously each of the T executors re-generated the full stream and
filtered (O(T×N) work, the shape that kills at scale). A production
source whose data is NOT a driver-known fixture would instead derive a
per-partition RNG seed (or read per-receiver files) so generation
itself happens executor-side; for a byte-pinned fixture the driver IS
the source of truth.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
)


class NmeaFixtureDataSource(DataSource):
    """``format("nmea_fixture")`` — options: n_tracks, n_seconds."""

    @classmethod
    def name(cls) -> str:
        return "nmea_fixture"

    def schema(self) -> str:
        return "line_no long, track_id long, value string"

    def reader(self, schema) -> "NmeaFixtureReader":
        return NmeaFixtureReader(self.options)


class NmeaFixtureReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_tracks = int(options.get("n_tracks", 3))
        self.n_seconds = int(options.get("n_seconds", 120))

    def partitions(self):
        # Driver-side, once per planned scan: generate the sequential
        # fixture stream and slice it per track. Each InputPartition is
        # pickled separately into its own task, so an executor receives
        # (and yields) only its track — read work is O(slice), total
        # O(N), while the emitted bytes stay pinned to FIXTURES.md §A.1.
        from gps_stream_processing_spark.sources.nmea import generate_nmea_rows

        by_track: dict[int, list[tuple[int, int, str]]] = {
            t: [] for t in range(self.n_tracks)
        }
        for row in generate_nmea_rows(
            n_tracks=self.n_tracks, n_seconds=self.n_seconds
        ):
            by_track[row[1]].append(row)
        return [InputPartition(by_track[t]) for t in range(self.n_tracks)]

    def read(self, partition):
        yield from partition.value


class NmeaSynthDataSource(DataSource):
    """``format("nmea_synth")`` — the PRODUCTION-shaped twin of
    ``nmea_fixture``: generation happens executor-side, derived from
    the partition descriptor alone (per-track RNG seed + per-track
    line_no namespace, ``sources/nmea.py::generate_track_rows``), so
    the source scales to any number of tracks with O(slice) work per
    task and O(1) bytes per InputPartition. Options: n_tracks,
    n_seconds, seed, tracks_per_partition (task granularity —
    production tuning knob so 10⁵ tracks don't mean 10⁵ tasks)."""

    @classmethod
    def name(cls) -> str:
        return "nmea_synth"

    def schema(self) -> str:
        return "line_no long, track_id long, value string"

    def reader(self, schema) -> "NmeaSynthReader":
        return NmeaSynthReader(self.options)

    def streamReader(self, schema) -> "NmeaSynthStreamReader":
        return NmeaSynthStreamReader(self.options)


class NmeaSynthReader(DataSourceReader):
    def __init__(self, options) -> None:
        import os

        self.n_tracks = int(options.get("n_tracks", 3))
        self.n_seconds = int(options.get("n_seconds", 120))
        self.seed = int(options.get("seed", 42))
        self.tracks_per_partition = int(options.get("tracks_per_partition", 1))
        # Shipped in the pickled reader so the executor-side import of
        # generate_track_rows works even when the worker process didn't
        # inherit the repo on PYTHONPATH.
        self.repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )

        # filter-pushdown state: None = no pushed predicate; else the
        # set of track_ids the scan must produce (source-side pruning)
        self.pushed_tracks = None

    def pushFilters(self, filters):
        """Spark 4.1 source-side FILTER PUSHDOWN: accept
        ``track_id = <v>`` (and In-style OR groups arrive as separate
        EqualTo calls only when AND'd — Spark sends conjuncts), prune
        whole partitions before they are scheduled, and hand every
        other predicate back for Spark to evaluate. This is the
        DataSource-API analog of parquet row-group pruning: at 10⁵
        receivers, `WHERE track_id = k` schedules ONE task instead of
        10⁵ — the work never happens rather than being filtered after
        generation."""
        from pyspark.sql.datasource import EqualTo, In

        unsupported = []  # eager, not a generator: the pruning side
        for f in filters:  # effect must fire even if Spark never
            vals = None  # iterates the returned remainder
            if isinstance(f, EqualTo) and f.attribute == ("track_id",):
                vals = {f.value}
            elif isinstance(f, In) and f.attribute == ("track_id",):
                vals = set(f.value)
            if vals is not None and all(isinstance(v, int) for v in vals):
                self.pushed_tracks = (
                    vals
                    if self.pushed_tracks is None
                    else self.pushed_tracks & vals
                )
            else:
                unsupported.append(f)  # Spark keeps evaluating it
        return unsupported

    def partitions(self):
        step = self.tracks_per_partition
        parts = [
            (lo, min(lo + step, self.n_tracks))
            for lo in range(0, self.n_tracks, step)
        ]
        if self.pushed_tracks is not None:
            parts = [
                (lo, hi)
                for lo, hi in parts
                if any(lo <= t < hi for t in self.pushed_tracks)
            ]
        return [InputPartition(p) for p in parts]

    def read(self, partition):
        import sys

        if self.repo_root not in sys.path:
            sys.path.insert(0, self.repo_root)
        from gps_stream_processing_spark.sources.nmea import generate_track_rows

        lo, hi = partition.value
        tracks = range(lo, hi)
        if self.pushed_tracks is not None:
            # consumed filters are NOT re-checked by Spark — the scan
            # itself must honor them exactly, including within a
            # multi-track partition
            tracks = [t for t in tracks if t in self.pushed_tracks]
        for track in tracks:
            yield from generate_track_rows(
                track, n_seconds=self.n_seconds, seed=self.seed
            )


class NmeaSynthStreamReader(DataSourceStreamReader):
    """STREAMING twin of :class:`NmeaSynthReader` (Spark 4 Python
    DataSourceStreamReader): the synthetic receivers as a live source.

    Offset model: event-time SECONDS emitted so far, ``{"sec": n}`` —
    the analog of a per-topic high-watermark. ``latestOffset`` admits
    ``seconds_per_batch`` more seconds per poll (capped at
    ``n_seconds``), so a ``processAllAvailable`` drive executes
    ceil(n_seconds / seconds_per_batch) genuine micro-batches with
    offset ranges [s, e); each batch's partitions are one per track
    group (the batch reader's task granularity), and ``read``
    regenerates the track deterministically and slices seconds
    [s, e) — exactly-once by construction since the offset ranges
    partition the stream. Under trigger availableNow Spark caps at the
    FIRST latestOffset (no admission-control API in the Python source
    yet), i.e. one batch of ``seconds_per_batch`` seconds — the
    registered query therefore drives with processAllAvailable.

    Scale shape: offsets advance in O(1) driver-side; per-batch work is
    O(tracks x batch-seconds) executor-side with O(1)-byte partition
    descriptors — a real deployment swaps the regenerate-and-slice for
    a broker seek, nothing else changes."""

    def __init__(self, options) -> None:
        import os

        self.n_tracks = int(options.get("n_tracks", 3))
        self.n_seconds = int(options.get("n_seconds", 120))
        self.seed = int(options.get("seed", 42))
        self.seconds_per_batch = int(options.get("seconds_per_batch", 30))
        self.tracks_per_partition = int(options.get("tracks_per_partition", 1))
        self._admitted = 0
        self.repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )

    def initialOffset(self) -> dict:
        return {"sec": 0}

    def latestOffset(self) -> dict:
        self._admitted = min(self._admitted + self.seconds_per_batch, self.n_seconds)
        return {"sec": self._admitted}

    def partitions(self, start: dict, end: dict):
        # Restart monotonicity (ADVICE r7): the admission counter lives
        # in driver memory and restarts at 0, so a query resumed from a
        # durable checkpoint could see latestOffset transiently BEHIND
        # the restored start offset. Seed the counter from the offsets
        # Spark hands back — on restart the engine re-plans the last
        # uncommitted range first, so this floors _admitted before the
        # next latestOffset poll. Residual window: a restart whose
        # checkpoint was fully committed consults latestOffset before
        # any partitions() call; the Python source API has no
        # restored-offset hook to close that (the engine just waits
        # until admission catches up — no data is lost or duplicated,
        # offset ranges still partition the stream).
        self._admitted = max(self._admitted, end["sec"])
        step = self.tracks_per_partition
        return [
            InputPartition((lo, min(lo + step, self.n_tracks), start["sec"], end["sec"]))
            for lo in range(0, self.n_tracks, step)
        ]

    def read(self, partition):
        import sys

        if self.repo_root not in sys.path:
            sys.path.insert(0, self.repo_root)
        from gps_stream_processing_spark.sources.nmea import (
            generate_track_rows_by_second,
        )

        lo, hi, s, e = partition.value
        for track in range(lo, hi):
            for sec, burst in generate_track_rows_by_second(
                track, n_seconds=self.n_seconds, seed=self.seed
            ):
                if s <= sec < e:
                    yield from burst

    def commit(self, end: dict) -> None:
        # nothing external to acknowledge (generation is pure); keep
        # the admission floor in step with the committed watermark
        self._admitted = max(self._admitted, end["sec"])


class JsonlLandDataSource(DataSource):
    """``format("jsonl_land")`` — a pure-Python DataSource WRITER
    (Spark 4 ``DataSourceWriter``), the sink-side twin of the readers
    above: each task streams its rows to a private ``*.jsonl.tmp``
    file under ``path``, returns the name as its commit message, and
    the driver-side ``commit()`` renames every temp file to its final
    ``part-*.jsonl`` name in one pass — the classic two-phase commit
    (task outputs invisible until the job commits; a failed job leaves
    only ``.tmp`` litter that ``abort()`` removes, never a torn
    dataset). Scale: one file per task, no driver data movement —
    commit touches O(tasks) names, not O(rows)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_land"

    def writer(self, schema, overwrite: bool) -> "JsonlLandWriter":
        return JsonlLandWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "JsonlLandStreamWriter":
        return JsonlLandStreamWriter(self.options)


class JsonlLandWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_land requires a path")
        self.overwrite = overwrite

    def write(self, iterator):
        """Task-side: rows → one private jsonl temp file."""
        import json
        import os
        import uuid

        from pyspark.sql.datasource import WriterCommitMessage

        os.makedirs(self.path, exist_ok=True)
        tmp = f"part-{uuid.uuid4().hex}.jsonl.tmp"
        n = 0
        with open(os.path.join(self.path, tmp), "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1

        class _Msg(WriterCommitMessage):
            pass

        m = _Msg()
        m.tmp_name = tmp
        m.n_rows = n
        return m

    def commit(self, messages) -> None:
        """Driver-side: publish every task file atomically-enough
        (rename is atomic per file; readers only glob ``*.jsonl``)."""
        import os

        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, f))
        for m in messages:
            if m is None:
                continue
            src = os.path.join(self.path, m.tmp_name)
            os.rename(src, src[: -len(".tmp")])

    def abort(self, messages) -> None:
        import os

        for m in messages or []:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.tmp_name))
            except OSError:
                pass


class JsonlLandStreamWriter(DataSourceStreamWriter):
    """STREAMING twin of :class:`JsonlLandWriter` (Spark 4
    ``DataSourceStreamWriter``): per-MICRO-BATCH two-phase commit.
    Tasks land private temp files exactly like the batch writer; the
    driver-side ``commit(messages, batchId)`` publishes them under
    DETERMINISTIC ``batch-<id>-part-<taskIdx>`` names, then drops a
    ``_commits/<id>`` marker via temp-write + atomic rename — the
    marker is the single commit point. Replay safety has two layers
    (ADVICE r9 hardening): (1) a marker hit means the batch is fully
    published — the replay discards its duplicate temps; (2) a crash
    INSIDE the commit window (some files renamed, no marker yet)
    leaves no marker, so the replayed commit runs again — and because
    publish names derive from (batchId, task index), not the task
    uuid, the re-publish OVERWRITES the partial attempt's files
    (rename-over is atomic on POSIX) instead of adding duplicates;
    stale leftovers from an attempt with more tasks are swept by
    prefix before the rename loop. That idempotent-republish + marker
    protocol is what turns Spark's at-least-once batch re-delivery
    into exactly-once sink output — the contract every custom
    streaming sink must implement (Kafka's transactional producer,
    Delta's txn table do the same). Commit touches O(tasks) names."""

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_land requires a path")

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark.sql.datasource import WriterCommitMessage

        os.makedirs(self.path, exist_ok=True)
        tmp = f"part-{uuid.uuid4().hex}.jsonl.tmp"
        n = 0
        with open(os.path.join(self.path, tmp), "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1

        class _Msg(WriterCommitMessage):
            pass

        m = _Msg()
        m.tmp_name = tmp
        m.n_rows = n
        return m

    def commit(self, messages, batchId: int) -> None:
        import os

        marker_dir = os.path.join(self.path, "_commits")
        os.makedirs(marker_dir, exist_ok=True)
        marker = os.path.join(marker_dir, str(batchId))
        if os.path.exists(marker):
            # replayed batch after checkpoint recovery: the data is
            # already published — discard the duplicate temps
            self.abort(messages, batchId)
            return
        # no marker → either first attempt or a crash mid-commit.
        # Sweep any partial attempt's files (the deterministic names
        # below overwrite same-index files, but a previous attempt
        # with MORE tasks could leave orphans behind), then publish
        # under (batchId, task index) names so re-publish overwrites.
        prefix = f"batch-{batchId}-part-"
        for f in os.listdir(self.path):
            if f.startswith(prefix) and f.endswith(".jsonl"):
                os.remove(os.path.join(self.path, f))
        for i, m in enumerate(messages):
            if m is None:
                continue
            src = os.path.join(self.path, m.tmp_name)
            dst = os.path.join(self.path, f"{prefix}{i:05d}.jsonl")
            os.replace(src, dst)
        # marker write is itself atomic: temp file + rename is the one
        # commit point — a crash anywhere earlier replays cleanly.
        tmp_marker = marker + ".tmp"
        with open(tmp_marker, "w") as fh:
            fh.write(str(sum(m.n_rows for m in messages if m is not None)))
        os.replace(tmp_marker, marker)

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages or []:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.tmp_name))
            except OSError:
                pass


def register_nmea_datasource(spark) -> None:
    """Idempotent per-session registration of all formats."""
    for src in (NmeaFixtureDataSource, NmeaSynthDataSource, JsonlLandDataSource):
        try:
            spark.dataSource.register(src)
        except Exception:  # noqa: BLE001 — already registered is fine
            pass
