"""Small host-side IO helpers (reference: thinkdiff/common/utils.py)."""

from __future__ import annotations

import datetime
import json
import os
from typing import Any

import numpy as np
import yaml

from thinkdiff_tpu.core.registry import registry


def now() -> str:
    """Job-id timestamp (reference utils.py:35-38)."""
    return datetime.datetime.now().strftime("%Y%m%d%H%M")[:-1]


def get_cache_path(rel_path: str) -> str:
    return os.path.expanduser(os.path.join(registry.get_path("cache_root"), rel_path))


def get_abs_path(rel_path: str) -> str:
    return os.path.join(registry.get_path("library_root"), rel_path)


def makedir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def load_json(path: str) -> Any:
    with open(path, "r") as f:
        return json.load(f)


def save_json(obj: Any, path: str, indent=None) -> None:
    makedir(os.path.dirname(os.path.abspath(path)))
    with open(path, "w") as f:
        json.dump(obj, f, indent=indent)


def load_yaml_file(path: str) -> Any:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def save_yaml_file(obj: Any, path: str) -> None:
    makedir(os.path.dirname(os.path.abspath(path)))
    with open(path, "w") as f:
        yaml.safe_dump(obj, f)


def save_npy(arr: np.ndarray, path: str) -> None:
    makedir(os.path.dirname(os.path.abspath(path)))
    np.save(path, arr)


def load_npy(path: str) -> np.ndarray:
    return np.load(path)


# --------------------- URL / download / cache helpers -----------------------
# Reference surface: thinkdiff/common/utils.py:41-273 (is_url, gdrive URL
# transforms, download_url / download_and_extract_archive, cache_url,
# create_file_symlink) — vestigial in the active configs (checkpoints are
# local paths) but part of the §2.1 utility inventory. Downloads honor
# THINKDIFF_OFFLINE=1 (and fail with a clear error in zero-egress
# environments instead of hanging).

import hashlib
import logging
import shutil
import urllib.parse
import urllib.request

_log = logging.getLogger(__name__)


def is_url(url_or_filename: str) -> bool:
    return urllib.parse.urlparse(str(url_or_filename)).scheme in (
        "http", "https")


def to_google_drive_download_url(view_url: str) -> str:
    """https://drive.google.com/file/d/<ID>/view -> uc?export=download URL."""
    parts = view_url.rstrip("/").split("/")
    assert parts[-1] == "view", f"not a gdrive view url: {view_url}"
    return ("https://drive.google.com/uc?export=download&id=" + parts[-2])


def google_drive_file_id(url: str):
    """File id from either a /file/d/<ID>/view or a uc?id=<ID> URL; None if
    the url is not a google drive link."""
    p = urllib.parse.urlparse(url)
    if p.netloc != "drive.google.com":
        return None
    if "/file/d/" in p.path:
        return p.path.split("/file/d/")[1].split("/")[0]
    q = urllib.parse.parse_qs(p.query)
    return q.get("id", [None])[0]


def check_md5(path: str, md5: str, chunk: int = 1 << 20) -> bool:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while blk := f.read(chunk):
            h.update(blk)
    return h.hexdigest() == md5


def _assert_online(url: str):
    if os.environ.get("THINKDIFF_OFFLINE") == "1":
        raise RuntimeError(
            f"download of {url} blocked: THINKDIFF_OFFLINE=1 (zero-egress "
            "environment). Stage the file locally and pass its path.")


def download_url(url: str, root: str, filename: str = None,
                 md5: str = None, timeout: float = 60.0) -> str:
    """Fetch ``url`` into ``root/filename`` unless already present (and
    md5-valid when given). Returns the local path."""
    makedir(root)
    filename = filename or os.path.basename(
        urllib.parse.urlparse(url).path) or "download"
    path = os.path.join(root, filename)
    if os.path.isfile(path) and (md5 is None or check_md5(path, md5)):
        return path
    _assert_online(url)
    _log.info("downloading %s -> %s", url, path)
    tmp = path + ".part"
    with urllib.request.urlopen(url, timeout=timeout) as r, \
            open(tmp, "wb") as f:
        shutil.copyfileobj(r, f)
    os.replace(tmp, path)
    if md5 is not None and not check_md5(path, md5):
        os.remove(path)
        raise RuntimeError(f"md5 mismatch for {url}")
    return path


def download_and_extract_archive(url: str, download_root: str,
                                 extract_root: str = None,
                                 filename: str = None, md5: str = None) -> str:
    """download_url + shutil.unpack_archive (tar/zip/gz). Returns the
    extract root."""
    extract_root = extract_root or download_root
    path = download_url(url, download_root, filename, md5)
    makedir(extract_root)
    shutil.unpack_archive(path, extract_root)
    return extract_root


def cache_url(url: str, cache_dir: str = None) -> str:
    """Mirror ``url`` under the cache dir keyed by its path; download once."""
    cache_dir = cache_dir or get_cache_path("url_cache")
    p = urllib.parse.urlparse(url)
    dirname = os.path.join(cache_dir, os.path.dirname(p.path.lstrip("/")))
    return download_url(url, dirname, filename=os.path.basename(p.path))


def create_file_symlink(file1: str, file2: str) -> None:
    """Point ``file2`` at ``file1`` (latest-checkpoint convention); best
    effort, never raises."""
    try:
        if os.path.lexists(file2):
            os.remove(file2)
        os.symlink(file1, file2)
    except OSError as e:
        _log.info("could not create symlink %s -> %s: %s", file2, file1, e)


def cleanup_dir(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)


def get_file_size(path: str) -> float:
    """Size in MB (reference get_file_size contract)."""
    return os.path.getsize(path) / 1024.0 / 1024.0


def save_file(data: Any, filename: str, append_to_json: bool = True) -> None:
    """Multi-format save: .npy/.json/.yaml/.pkl — json appends a line by
    default (the reference's incremental-metrics convention)."""
    import pickle

    makedir(os.path.dirname(os.path.abspath(filename)))
    ext = os.path.splitext(filename)[1]
    if ext in (".pkl", ".pickle"):
        with open(filename, "wb") as f:
            pickle.dump(data, f, pickle.HIGHEST_PROTOCOL)
    elif ext == ".npy":
        np.save(filename, data)
    elif ext == ".json":
        mode = "a" if append_to_json else "w"
        with open(filename, mode) as f:
            f.write(json.dumps(data, sort_keys=True) + "\n")
    elif ext == ".yaml":
        save_yaml_file(data, filename)
    else:
        raise ValueError(f"saving {ext} is not supported")


def load_file(filename: str, mmap_mode=None, allow_pickle: bool = False):
    """Multi-format load: .txt/.pkl/.npy/.json/.yaml/.csv."""
    import pickle

    ext = os.path.splitext(filename)[1]
    if ext == ".txt":
        with open(filename) as f:
            return f.readlines()
    if ext in (".pkl", ".pickle"):
        with open(filename, "rb") as f:
            return pickle.load(f, encoding="latin1")
    if ext == ".npy":
        return np.load(filename, mmap_mode=mmap_mode,
                       allow_pickle=allow_pickle, encoding="latin1")
    if ext == ".json":
        return load_json(filename)
    if ext == ".yaml":
        return load_yaml_file(filename)
    if ext == ".csv":
        import csv
        with open(filename) as f:
            return list(csv.DictReader(f))
    raise ValueError(f"reading {ext} is not supported")
