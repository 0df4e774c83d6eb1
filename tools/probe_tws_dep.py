"""Probe: can this image ever satisfy transformWithStateInPandas's
Python runtime dependency? (r7 verdict, next-round #4.)

pyspark 4.1.2 ships the transformWithStateInPandas API, but its
Python-side state server imports ``google.protobuf`` at runtime
(``pyspark/sql/streaming/proto/...``); the port in
``streaming/events.py`` is therefore gated on BOTH the API and the
dep, with an always-on guard-equivalence test. The verdict asked
whether the live test could be unskipped by vendoring/installing
protobuf. This probe records why it cannot, from inside the image:

1. ``google.protobuf`` is not importable;
2. no protobuf wheel / sdist / dist-info exists anywhere on disk to
   vendor from;
3. the image has NO package-index network access — DNS resolution
   itself fails (probed via socket against well-known public package
   hosts; pip's own fetch fails the same way with "Name or service
   not known" after retries);
4. site-packages is writable, so the gate is purely the absence of
   any source for the package — and the build environment's policy
   additionally forbids package installation.

Writes a round-dated PROBE_TWS_r{N}.json — the round number is
derived at runtime from VERDICT.md via bench._current_round (r11
ADVICE: the hardcoded name was an easy-to-forget manual bump).
Re-run if the image changes; if protobuf
ever appears, the guard in streaming/events.py automatically takes the
live path and the skip evaporates (that behavior is itself pinned by
tests/test_streaming.py's guard-equivalence test).
"""

from __future__ import annotations

import importlib.util
import json
import os
import site
import socket
import subprocess
import sys


def main() -> None:
    report: dict = {"python": sys.version.split()[0]}

    report["google_protobuf_importable"] = (
        importlib.util.find_spec("google.protobuf") is not None
        if importlib.util.find_spec("google") is not None
        else False
    )

    # any vendorable artifact on disk?
    hits: list[str] = []
    for root in ("/usr", "/opt", "/root/.pyenv", "/srv", "/var/cache"):
        if not os.path.isdir(root):
            continue
        proc = subprocess.run(
            ["find", root, "-iname", "protobuf*", "-not", "-path", "*/jars/*"],
            capture_output=True, text=True, timeout=120,
        )
        hits += [ln for ln in proc.stdout.splitlines()
                 if any(ln.endswith(x) for x in (".whl", ".tar.gz", ".zip"))
                 or "dist-info" in ln or "egg-info" in ln]
    report["vendorable_artifacts_on_disk"] = hits

    dns: dict[str, str] = {}
    for host in ("pypi.org", "files.pythonhosted.org"):
        try:
            socket.getaddrinfo(host, 443)
            dns[host] = "resolves"
        except OSError as exc:
            dns[host] = f"DNS failure: {exc}"
    report["package_index_dns"] = dns

    sp = site.getsitepackages()[0]
    report["site_packages_writable"] = os.access(sp, os.W_OK)
    report["conclusion"] = (
        "image cannot satisfy the dep: not installed, nothing on disk "
        "to vendor, no package-index network (DNS fails), and the "
        "environment policy forbids package installation; the "
        "transformWithState live test remains env-gated with the "
        "always-on guard-equivalence test standing in"
    )

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    from bench import _current_round

    rnd = _current_round(here)
    name = f"PROBE_TWS_r{rnd}.json" if rnd else "PROBE_TWS_undated.json"
    out = os.path.join(here, name)
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
