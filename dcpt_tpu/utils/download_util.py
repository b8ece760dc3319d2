"""Model/file fetchers (reference: basicsr/utils/download_util.py:12-103).

Gated on ``requests``; in zero-egress environments these raise a clear error.
"""

from __future__ import annotations

import math
import os
from urllib.parse import urlparse

from .misc import sizeof_fmt


def download_file_from_google_drive(file_id: str, save_path: str) -> None:
    """Download a Google-Drive file by id (reference: download_util.py:12-46)."""
    import requests

    session = requests.Session()
    URL = "https://docs.google.com/uc?export=download"
    params = {"id": file_id}
    response = session.get(URL, params=params, stream=True)

    token = None
    for key, value in response.cookies.items():
        if key.startswith("download_warning"):
            token = value
    if token:
        response = session.get(URL, params={"id": file_id, "confirm": token}, stream=True)

    os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
    size = 0
    with open(save_path, "wb") as f:
        for chunk in response.iter_content(32768):
            if chunk:
                f.write(chunk)
                size += len(chunk)
    print(f"Downloaded {sizeof_fmt(size)} to {save_path}")


def load_file_from_url(url: str, model_dir: str | None = None, progress: bool = True, file_name: str | None = None) -> str:
    """Download a URL into model_dir unless cached (reference: download_util.py:74-103)."""
    if model_dir is None:
        model_dir = os.path.join(os.path.expanduser("~"), ".cache", "dcpt_tpu", "weights")
    os.makedirs(model_dir, exist_ok=True)

    parts = urlparse(url)
    filename = os.path.basename(parts.path)
    if file_name is not None:
        filename = file_name
    cached_file = os.path.abspath(os.path.join(model_dir, filename))
    if not os.path.exists(cached_file):
        import requests

        print(f'Downloading: "{url}" to {cached_file}\n')
        with requests.get(url, stream=True) as r:
            r.raise_for_status()
            with open(cached_file, "wb") as f:
                for chunk in r.iter_content(32768):
                    f.write(chunk)
    return cached_file
