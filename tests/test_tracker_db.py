"""
MongoDB tracker (against an in-memory fake pymongo/gridfs) and the
database-update app (against a fake FTP server).
"""

import gzip
import os
import sys
import types

import pytest

from evcouplings_tpu.utils.update_database import (
    download_ftp_file,
    symlink_force,
)


# ---------------------------------------------------------------------
# fake pymongo / gridfs
# ---------------------------------------------------------------------

class _FakeCollection:
    def __init__(self):
        self.docs = {}

    def update_one(self, filt, update, upsert=False):
        key = filt["job_id"]
        doc = self.docs.get(key)
        if doc is None:
            if not upsert:
                return
            doc = dict(update.get("$setOnInsert", {}))
            self.docs[key] = doc
        for k, v in update.get("$set", {}).items():
            doc[k] = v

    def find_one(self, filt):
        return self.docs.get(filt["job_id"])

    def find(self, filt):
        doc = self.docs.get(filt["job_id"])
        return [] if doc is None else [doc]


class _FakeDB:
    def __init__(self):
        self.collections = {}

    def __getitem__(self, name):
        return self.collections.setdefault(name, _FakeCollection())


class _FakeClient:
    def __init__(self, connection_string):
        self.connection_string = connection_string
        self._db = _FakeDB()

    def get_default_database(self):
        return self._db


class _FakeGridFile:
    def __init__(self, _id, filename, data, **meta):
        self._id = _id
        self.filename = filename
        self.data = data
        self.meta = meta


class _FakeGridFS:
    def __init__(self, db, collection=None):
        self.files = {}
        self._next = 0

    def put(self, fobj, filename=None, **meta):
        self._next += 1
        self.files[self._next] = _FakeGridFile(
            self._next, filename, fobj.read(), **meta
        )
        return self._next

    def find(self, query):
        return [
            f for f in list(self.files.values())
            if f.filename == query.get("filename")
        ]

    def delete(self, file_id):
        self.files.pop(file_id, None)


@pytest.fixture
def fake_mongo(monkeypatch):
    pymongo = types.ModuleType("pymongo")
    pymongo.MongoClient = _FakeClient
    gridfs = types.ModuleType("gridfs")
    gridfs.GridFS = _FakeGridFS
    monkeypatch.setitem(sys.modules, "pymongo", pymongo)
    monkeypatch.setitem(sys.modules, "gridfs", gridfs)
    return pymongo


def _make_tracker(tmp_path, **overrides):
    from evcouplings_tpu.utils.tracker.mongodb import MongoDBTracker

    kwargs = dict(
        connection_string="mongodb://localhost/evc",
        job_id="job1",
        prefix=str(tmp_path / "out"),
        pipeline="protein_monomer",
        file_list=None,
        delete_list=[],
        config={"stages": ["align"]},
        retry_max_number=1,
        retry_wait=0,
    )
    kwargs.update(overrides)
    return MongoDBTracker(**kwargs)


class TestMongoDBTracker:
    def test_requires_pymongo(self, monkeypatch, tmp_path):
        monkeypatch.setitem(sys.modules, "pymongo", None)
        with pytest.raises(ImportError, match="pymongo"):
            _make_tracker(tmp_path)

    def test_upsert_and_status_transitions(self, fake_mongo, tmp_path):
        t = _make_tracker(tmp_path)
        t.update(status="pending")
        doc = t.jobs.find_one({"job_id": "job1"})
        assert doc["status"] == "pending"
        assert doc["pipeline"] == "protein_monomer"
        assert doc["config"] == {"stages": ["align"]}

        t.update(status="running", stage="align", message="go")
        doc = t.jobs.find_one({"job_id": "job1"})
        assert doc["status"] == "running"
        assert doc["stage"] == "align"
        assert doc["message"] == "go"
        assert "time_started" in doc

    def test_get_returns_current_document(self, fake_mongo, tmp_path):
        t = _make_tracker(tmp_path)
        assert t.get() is None
        t.update(status="running", stage="align")
        doc = t.get()
        assert doc["status"] == "running"
        assert doc["stage"] == "align"

    def test_results_merge_and_file_sync(self, fake_mongo, tmp_path):
        f1 = tmp_path / "a.csv"
        f1.write_text("x,y\n1,2\n")
        t = _make_tracker(tmp_path)
        t.update(results={
            "alignment_file": str(f1),
            "num_sequences": 10,
            "missing_file": str(tmp_path / "nope.txt"),
        })
        doc = t.jobs.find_one({"job_id": "job1"})
        assert doc["results.num_sequences"] == 10
        assert doc["results.alignment_file"] == str(f1)
        # only the existing *_file was mirrored into gridfs
        stored = list(t.fs.files.values())
        assert len(stored) == 1
        assert stored[0].filename == "job1:alignment_file"
        assert stored[0].data == b"x,y\n1,2\n"

        # re-sync replaces the stale copy instead of duplicating
        f1.write_text("x,y\n3,4\n")
        t.update(results={"alignment_file": str(f1)})
        stored = list(t.fs.files.values())
        assert len(stored) == 1
        assert stored[0].data == b"x,y\n3,4\n"

    def test_file_list_and_delete_list_filters(self, fake_mongo,
                                               tmp_path):
        f1 = tmp_path / "keep.csv"
        f1.write_text("k")
        f2 = tmp_path / "skip.csv"
        f2.write_text("s")
        f3 = tmp_path / "del.csv"
        f3.write_text("d")
        t = _make_tracker(
            tmp_path,
            file_list=["keep_file", "del_file"],
            delete_list=["del_file"],
        )
        t.update(results={
            "keep_file": str(f1),
            "skip_file": str(f2),
            "del_file": str(f3),
        })
        stored = {f.filename for f in t.fs.files.values()}
        assert stored == {"job1:keep_file"}
        doc = t.jobs.find_one({"job_id": "job1"})
        # delete-listed results are not recorded at all
        assert "results.del_file" not in doc
        assert doc["results.skip_file"] == str(f2)


# ---------------------------------------------------------------------
# update_database
# ---------------------------------------------------------------------

class _FakeFTP:
    """Serves an in-memory file map through the ftplib surface used by
    download_ftp_file."""

    store = {}

    def __init__(self, url):
        self.url = url

    def login(self):
        pass

    def cwd(self, path):
        self.path = path

    def size(self, name):
        return len(self.store[(self.path, name)])

    def retrbinary(self, cmd, callback, blocksize=8192):
        assert cmd.startswith("RETR ")
        data = self.store[(self.path, cmd[5:])]
        for i in range(0, len(data), blocksize):
            callback(data[i:i + blocksize])

    def quit(self):
        pass


class TestUpdateDatabase:
    def test_symlink_force(self, tmp_path):
        a = tmp_path / "a"
        b = tmp_path / "b"
        a.write_text("A")
        b.write_text("B")
        link = tmp_path / "current"
        symlink_force(str(a), str(link))
        assert link.read_text() == "A"
        symlink_force(str(b), str(link))
        assert link.read_text() == "B"

    def test_download_ftp_file_gzip(self, tmp_path, monkeypatch):
        payload = b">sp|P1|X\nACDEF\n" * 100
        _FakeFTP.store = {
            ("/db/", "uniref.fasta.gz"): gzip.compress(payload)
        }
        monkeypatch.setattr("ftplib.FTP", _FakeFTP)
        out = tmp_path / "uniref.fasta"
        download_ftp_file(
            "ftp.example.org", "/db/", "uniref.fasta.gz", str(out),
            gziped=True,
        )
        assert out.read_bytes() == payload

    def test_download_ftp_file_append(self, tmp_path, monkeypatch):
        _FakeFTP.store = {
            ("/db/", "one.gz"): gzip.compress(b"first\n"),
            ("/db/", "two.gz"): gzip.compress(b"second\n"),
        }
        monkeypatch.setattr("ftplib.FTP", _FakeFTP)
        out = tmp_path / "cat.fasta"
        download_ftp_file("u", "/db/", "one.gz", str(out), gziped=True)
        download_ftp_file("u", "/db/", "two.gz", str(out),
                          gziped=True, file_handling="ab")
        assert out.read_bytes() == b"first\nsecond\n"

    def test_run_layout_and_symlinks(self, tmp_path, monkeypatch):
        import evcouplings_tpu.utils.update_database as ud

        downloaded = []

        def fake_download(ftp_url, ftp_cwd, file_url, output_path,
                          file_handling="wb", gziped=False,
                          verbose=False):
            downloaded.append(file_url)
            with open(output_path, file_handling) as f:
                f.write((file_url + "\n").encode())

        class FakeSIFTS:
            def __init__(self, table):
                # simulates download-on-construction of the mapping
                with open(table, "w") as f:
                    f.write("mapping")
                self.table = table

            def create_sequence_file(self, path):
                with open(path, "w") as f:
                    f.write("seqs")

        monkeypatch.setattr(ud, "download_ftp_file", fake_download)
        monkeypatch.setattr(
            "evcouplings_tpu.compare.sifts.SIFTS", FakeSIFTS
        )

        sifts_dir = tmp_path / "SIFTS"
        db_dir = tmp_path / "jackhmmer"
        ud.run(sifts=str(sifts_dir), db=str(db_dir), symlink=True)

        # SIFTS csv + fasta with dated names, plus _current symlinks
        csvs = list(sifts_dir.glob("pdb_chain_uniprot_plus_*.csv"))
        assert len(csvs) == 2  # dated + current symlink
        cur = sifts_dir / "pdb_chain_uniprot_plus_current.csv"
        assert cur.is_symlink() and cur.read_text() == "mapping"
        cur_fa = sifts_dir / "pdb_chain_uniprot_plus_current.fasta"
        assert cur_fa.read_text() == "seqs"

        # uniprot = sprot + trembl concatenated; uniref single files
        up = list((db_dir / "uniprot").glob("uniprot_*_*.fasta"))
        assert len(up) == 1
        assert up[0].read_text() == (
            "uniprot_sprot.fasta.gz\nuniprot_trembl.fasta.gz\n"
        )
        for db_type in ("uniref100", "uniref90"):
            link = db_dir / db_type / f"{db_type}_current.fasta"
            assert link.is_symlink()
            assert link.read_text() == f"{db_type}.fasta.gz\n"

        assert downloaded == [
            "uniprot_sprot.fasta.gz", "uniprot_trembl.fasta.gz",
            "uniref100.fasta.gz", "uniref90.fasta.gz",
        ]
