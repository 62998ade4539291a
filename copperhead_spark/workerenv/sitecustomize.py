"""Python-worker startup patch (wired via spark.executorEnv.PYTHONPATH in
copperhead_spark/session.py; the `site` module imports any importable
`sitecustomize` at interpreter start, so pyspark.daemon and every forked
worker inherit this before the first task runs).

Why: pyspark's per-task setup (worker_util.setup_spark_files) calls
``importlib.invalidate_caches()`` on EVERY task.  On CPython 3.11,
``zipimport.zipimporter.invalidate_caches`` unconditionally re-reads the
whole zip central directory, and the workers' sys.path carries
pyspark.zip (~thousands of entries) with one zipimporter per package
subpath — measured ~0.25 CPU-s per task of pure directory re-parsing
(~1.9M struct unpacks per 32-task job), the dominant Python-boundary
overhead of every mapInArrow/pandas-UDF stage at bench scale.

Fix: guard the re-read behind an (mtime_ns, size) stat check per
archive — exactly the semantics CPython >= 3.12 ships (gh-87319 made
invalidate_caches conditional); a zip that actually changed is still
re-read, so the cache-invalidation contract is preserved.  No-op on
interpreters whose zipimport is not the known pure-python layout.
"""

import os

try:
    import zipimport

    _orig_invalidate = zipimport.zipimporter.invalidate_caches
    _zip_stat_cache: dict = {}

    def _stat_key(archive):
        st = os.stat(archive)
        return (st.st_mtime_ns, st.st_size)

    def _guarded_invalidate(self):
        try:
            key = _stat_key(self.archive)
        except OSError:
            _orig_invalidate(self)
            return
        if _zip_stat_cache.get(self.archive) == key:
            return  # archive unchanged: directory cache is still valid
        _orig_invalidate(self)
        _zip_stat_cache[self.archive] = key

    # only patch the pure-python zipimport (3.8+); anything else keeps
    # stock behavior
    if getattr(zipimport.zipimporter, "invalidate_caches", None) is not None:
        zipimport.zipimporter.invalidate_caches = _guarded_invalidate
except Exception:  # noqa: BLE001 - a failed patch must never break workers
    pass
