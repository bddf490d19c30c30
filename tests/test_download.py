"""Downloader: hash verification, unzip, resource table (offline)."""

import hashlib
import zipfile

import pytest

from proteingym_tpu.data import download as dl


def test_resource_table_complete():
    names = {r[0] for r in dl.RESOURCES}
    assert len(dl.RESOURCES) == 22  # published manifest rows
    assert "DMS_ProteinGym_substitutions" in names
    assert all(len(r[2]) == 64 for r in dl.RESOURCES)  # sha256 hex


def test_fetch_file_verifies_hash(tmp_path):
    src = tmp_path / "blob.bin"
    src.write_bytes(b"hello proteingym")
    good = hashlib.sha256(b"hello proteingym").hexdigest()
    url = src.as_uri()
    out = dl.fetch_file(url, tmp_path / "out.bin", expected_sha256=good)
    assert out.read_bytes() == b"hello proteingym"
    with pytest.raises(ValueError):
        dl.fetch_file(url, tmp_path / "out2.bin", expected_sha256="0" * 64)
    assert not (tmp_path / "out2.bin").exists()  # partial removed


def test_fetch_skips_existing_valid(tmp_path):
    src = tmp_path / "a.bin"
    src.write_bytes(b"x" * 100)
    sha = hashlib.sha256(b"x" * 100).hexdigest()
    dest = tmp_path / "cached.bin"
    dest.write_bytes(b"x" * 100)
    out = dl.fetch_file("file:///nonexistent", dest, expected_sha256=sha)
    assert out == dest  # served from cache, no network touched


def test_unzip(tmp_path):
    archive = tmp_path / "z.zip"
    with zipfile.ZipFile(archive, "w") as z:
        z.writestr("sub/a.csv", "x,y\n1,2\n")
        z.writestr("b.txt", "hi")
    files = dl.unzip(archive, tmp_path / "out")
    assert len(files) == 2
    assert (tmp_path / "out/sub/a.csv").read_text().startswith("x,y")


def test_download_resources_unknown_name(tmp_path):
    with pytest.raises(KeyError):
        dl.download_resources(names=["nope"], cache=tmp_path)
