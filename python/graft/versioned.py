"""The transactional versioned table (graft.sources.VersionedV2) from
Python: two-phase-commit writes, snapshot/time-travel reads, the
exactly-once streaming sink, and retention vacuum.
"""

FORMAT = "graft.sources.VersionedV2"


def write(df, path, mode="append"):
    """Commit ``df`` as one new immutable version (mode='overwrite'
    truncates: the new manifest starts empty)."""
    df.write.format(FORMAT).option("path", path).mode(mode).save()


def read(spark, path, version=None):
    """The committed snapshot — latest, or an explicit version."""
    r = spark.read.format(FORMAT).option("path", path)
    if version is not None:
        r = r.option("version", str(version))
    return r.load()


def write_stream(df, path, checkpoint, writer_id="default"):
    """Start the exactly-once streaming sink (one immutable version per
    micro-batch epoch; a replayed epoch after restart commits once).
    ``writer_id`` scopes the replay detection — set a distinct id per
    logical stream when several streams write one table (fresh
    checkpoints restart epoch ids at 0, so an unscoped marker would
    swallow a second stream's first batches as replays).
    Returns the StreamingQuery."""
    return (df.writeStream.format(FORMAT)
            .option("path", path).option("checkpointLocation", checkpoint)
            .option("writerId", writer_id)
            .outputMode("append").start())


def latest_version(spark, path):
    from graft.session import bridge
    return bridge(spark).versionedLatest(path)


def vacuum(spark, path, keep_versions=1, reclaim_dead_claims=False):
    """Retention vacuum: keep the newest ``keep_versions`` snapshots,
    drop older version directories, delete unreferenced data files.
    Returns a dict of counts."""
    from graft.session import bridge
    return dict(bridge(spark).vacuumVersioned(
        path, int(keep_versions), bool(reclaim_dead_claims)))


def delete_ids(spark, path, ids):
    """Row-level copy-on-write DELETE of the given ids — the GDPR
    erasure path. Publishes one new version rewriting only affected
    files; older snapshots still see the rows until ``vacuum``.
    Returns a dict report (version, rewritten_files, carried_files,
    deleted_rows, kept_rows)."""
    from graft.session import bridge
    jlist = spark._jvm.java.util.ArrayList()
    for i in ids:
        jlist.add(int(i))
    return dict(bridge(spark).deleteVersionedIds(path, jlist))


def evolve_schema(spark, path, name, type_name):
    """ADD-COLUMN schema evolution (nullable long/double/string):
    publishes a metadata-only version; reads at or after it null-fill
    the column for older files, earlier snapshots keep the old schema.
    Returns the version the evolution published."""
    from graft.session import bridge
    return int(bridge(spark).evolveVersioned(path, name, type_name))
