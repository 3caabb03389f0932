"""Misc utilities (reference utils.py:14-49)."""

from __future__ import annotations

import os

import numpy as np


def _host_cache_key() -> str:
    """Cache subdirectory key for the current host/backend.

    XLA:CPU AOT entries embed the compile machine's CPU feature set and
    fail (slowly!) to load on a host with different features, so CPU
    caches must be keyed by the host's feature fingerprint. TPU compiles
    target the accelerator, not the host — one shared subdir suffices.
    """
    import hashlib
    import platform

    import jax

    backend = "cpu"
    try:
        backend = jax.default_backend()
    except Exception:
        pass
    feats = ""
    model = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # the feature FLAGS alone are not a sufficient fingerprint:
                # XLA:CPU also bakes model-derived tuning hints (e.g.
                # +prefer-no-gather) into its AOT entries, and two machines
                # with identical flags but different models produced the
                # round-2/3 slow-failing-AOT-load storms — include the
                # model line in the key
                if not feats and line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                elif not model and line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                if feats and model:
                    break
    except OSError:
        pass
    h = hashlib.md5(
        f"{platform.machine()}|{model}|{feats}".encode()).hexdigest()[:10]
    # TPU entries are keyed by host too: they embed host-side XLA:CPU AOT
    # code whose loads fail (slowly, with SIGILL warnings) across machines
    return f"{backend}-{h}"


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Point JAX's persistent compilation cache at a repo-local directory.

    XLA:CPU compiles of the full train step are minutes-long on weak hosts;
    warm cache hits load in seconds. Used by tests/conftest.py, bench.py
    and the driver graft entry. Safe to call multiple times / before any
    computation. The directory is keyed per host fingerprint (see
    :func:`_host_cache_key`) so entries built on one machine never poison
    another's runs with slow failing AOT loads.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
    cache_dir = os.path.join(cache_dir, _host_cache_key())
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without these flags: cache is best-effort
        pass


def readlines(filename):
    with open(filename) as f:
        return f.read().splitlines()


def normalize_image(x):
    """Rescale image pixels to span range [0, 1] (reference utils.py:22-27)."""
    ma = float(np.max(x))
    mi = float(np.min(x))
    d = ma - mi if ma != mi else 1e5
    return (x - mi) / d


def sec_to_hm(t):
    t = int(t)
    s = t % 60
    t //= 60
    m = t % 60
    t //= 60
    return t, m, s


def sec_to_hm_str(t):
    """10239 -> '02h50m39s' (reference utils.py:41-49)."""
    h, m, s = sec_to_hm(t)
    return "{:02d}h{:02d}m{:02d}s".format(h, m, s)


# Monodepth2 public model-zoo bootstrap (reference utils.py:51-114). The
# (URL, md5) table is factual metadata of Niantic's published checkpoints.
MONODEPTH2_ZOO = {
    "mono_640x192":
        ("https://storage.googleapis.com/niantic-lon-static/research/monodepth2/mono_640x192.zip",
         "a964b8356e08a02d009609d9e3928f7c"),
    "stereo_640x192":
        ("https://storage.googleapis.com/niantic-lon-static/research/monodepth2/stereo_640x192.zip",
         "3dfb76bcff0786e4ec07ac00f658dd07"),
    "mono+stereo_640x192":
        ("https://storage.googleapis.com/niantic-lon-static/research/monodepth2/mono%2Bstereo_640x192.zip",
         "c024d69012485ed05d7eaa9617a96b81"),
    "mono_no_pt_640x192":
        ("https://storage.googleapis.com/niantic-lon-static/research/monodepth2/mono_no_pt_640x192.zip",
         "9c2f071e35027c895a4728358ffc913a"),
    "stereo_no_pt_640x192":
        ("https://storage.googleapis.com/niantic-lon-static/research/monodepth2/stereo_no_pt_640x192.zip",
         "41ec2de112905f85541ac33a854742d1"),
    "mono+stereo_no_pt_640x192":
        ("https://storage.googleapis.com/niantic-lon-static/research/monodepth2/mono%2Bstereo_no_pt_640x192.zip",
         "46c3b824f541d143a45c37df65fbab0a"),
    "mono_1024x320":
        ("https://storage.googleapis.com/niantic-lon-static/research/monodepth2/mono_1024x320.zip",
         "0ab0766efdfeea89a0d9ea8ba90e1e63"),
    "stereo_1024x320":
        ("https://storage.googleapis.com/niantic-lon-static/research/monodepth2/stereo_1024x320.zip",
         "afc2f2126d70cf3fdf26b550898b501a"),
    "mono+stereo_1024x320":
        ("https://storage.googleapis.com/niantic-lon-static/research/monodepth2/mono%2Bstereo_1024x320.zip",
         "cdc5fc9b23513c07d5b19235d9ef08f7"),
}


def download_model_if_doesnt_exist(model_name, models_dir="models"):
    """Download + unzip a Monodepth2 zoo checkpoint if absent, md5-verified."""
    import hashlib
    import os
    import urllib.request
    import zipfile

    os.makedirs(models_dir, exist_ok=True)
    model_path = os.path.join(models_dir, model_name)

    def md5_matches(checksum, fpath):
        if not os.path.exists(fpath):
            return False
        with open(fpath, "rb") as f:
            return hashlib.md5(f.read()).hexdigest() == checksum

    if os.path.exists(os.path.join(model_path, "encoder.pth")):
        return model_path

    model_url, required_md5 = MONODEPTH2_ZOO[model_name]
    if not md5_matches(required_md5, model_path + ".zip"):
        print(f"-> Downloading pretrained model to {model_path}.zip")
        urllib.request.urlretrieve(model_url, model_path + ".zip")
    if not md5_matches(required_md5, model_path + ".zip"):
        raise RuntimeError(
            "Failed to download a file which matches the checksum - quitting"
        )
    print("   Unzipping model...")
    with zipfile.ZipFile(model_path + ".zip", "r") as f:
        f.extractall(model_path)
    print(f"   Model unzipped to {model_path}")
    return model_path
