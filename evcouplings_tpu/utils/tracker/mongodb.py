"""
MongoDB-backed job tracker with GridFS file mirroring.

Parity target: reference evcouplings/utils/tracker/mongodb.py
(MongoDBTracker :41-414, gridfs file sync :133-252). Requires pymongo;
the import is deferred so the rest of the framework has no hard
dependency on it.
"""

import os
from datetime import datetime, timezone

from evcouplings_tpu.utils.helpers import retry
from evcouplings_tpu.utils.tracker.base import (
    DEFAULT_FILE_COLLECTION,
    DEFAULT_RESULT_COLLECTION,
    ResultTracker,
)

# reference-compatible names (reference utils/tracker/mongodb.py:30-38)
JOB_COLLECTION_NAME = DEFAULT_RESULT_COLLECTION
FILE_COLLECTION_NAME = DEFAULT_FILE_COLLECTION

try:
    from pymongo import errors as _mongo_errors

    CATCH_MONGODB_EXCEPTIONS = (
        _mongo_errors.ConnectionFailure,
        _mongo_errors.ServerSelectionTimeoutError,
        _mongo_errors.ExecutionTimeout,
        _mongo_errors.OperationFailure,
    )
except ImportError:       # pymongo optional; tracker errors at init
    CATCH_MONGODB_EXCEPTIONS = ()


def _now():
    return datetime.now(timezone.utc)


class MongoDBTracker(ResultTracker):
    """Job tracker storing job documents in MongoDB and result files in
    GridFS (so results survive deletion of the compute filesystem)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)

        try:
            from pymongo import MongoClient
            import gridfs  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "MongoDBTracker requires the pymongo package; install it "
                "or select a different tracker_type."
            ) from e

        self._MongoClient = MongoClient
        self.client = MongoClient(self.connection_string)
        self.db = self.client.get_default_database()
        self.jobs = self.db[DEFAULT_RESULT_COLLECTION]

        import gridfs
        self.fs = gridfs.GridFS(
            self.db, collection=DEFAULT_FILE_COLLECTION
        )

    def _retry(self, func):
        return retry(func, self.retry_max_number, self.retry_wait)

    def _sync_files(self, results):
        """Mirror result files into GridFS; replaces stale versions.

        Only keys listed in file_list (if given) are synced; files on
        the delete list are never synced.
        """
        synced = {}
        for key, value in results.items():
            if not key.endswith("_file") or value is None:
                continue
            if self.file_list is not None and key not in self.file_list:
                continue
            if key in (self.delete_list or []):
                continue
            if not os.path.isfile(value):
                continue

            filename = "{}:{}".format(self.job_id, key)
            # drop stale copies before storing the new version
            for old in self.fs.find({"filename": filename}):
                self.fs.delete(old._id)
            with open(value, "rb") as f:
                file_id = self.fs.put(
                    f, filename=filename, job_id=self.job_id, key=key
                )
            synced[key] = file_id
        return synced

    def get(self):
        """Return the current job document (or None); raises if the
        job_id matches more than one document (reference
        utils/tracker/mongodb.py:89-107). No retry on connection
        failure, matching the reference."""
        docs = list(self.jobs.find({"job_id": self.job_id}))
        if len(docs) == 0:
            return None
        if len(docs) > 1:
            raise ValueError(
                "Job ID not unique, found more than one job."
            )
        return docs[0]

    def update(self, status=None, message=None, stage=None, results=None):
        def _update():
            update_doc = {"$set": {"time_updated": _now()}}
            sets = update_doc["$set"]

            if status is not None:
                sets["status"] = status
                if status == "running":
                    update_doc.setdefault("$setOnInsert", {})
                    sets["time_started"] = _now()
            if message is not None:
                sets["message"] = str(message)
            if stage is not None:
                sets["stage"] = stage
            if results is not None:
                for k, v in results.items():
                    if k in (self.delete_list or []):
                        continue
                    sets["results.{}".format(k)] = v
                file_ids = self._sync_files(results)
                for k, v in file_ids.items():
                    sets["file_ids.{}".format(k)] = v

            on_insert = update_doc.setdefault("$setOnInsert", {})
            on_insert.update({
                "job_id": self.job_id,
                "prefix": self.prefix,
                "pipeline": self.pipeline,
                "config": self.config,
                "time_created": _now(),
            })
            # avoid conflicting $set / $setOnInsert paths
            for k in list(on_insert):
                if k in sets:
                    del on_insert[k]

            self.jobs.update_one(
                {"job_id": self.job_id}, update_doc, upsert=True
            )

        self._retry(_update)
