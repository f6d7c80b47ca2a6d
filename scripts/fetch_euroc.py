"""Fetch EuRoC MAV / TUM-VI sequences for the real-data ATE evaluation.

BASELINE.md's accuracy bar is EuRoC MH01-MH05 mono-inertial ATE RMSE in the
0.03-0.06 m range (the configs the reference ships exist precisely for this:
`/root/reference/config/Monocular-Inertial/EuRoC.yaml`,
`/root/reference/config/Stereo/TUM-VI.yaml`). This script downloads the
official archives and unpacks them into ``datasets/`` in the mav0 layout
`io/euroc.py` reads.

NOTE on this build container: egress is fully closed (DNS resolution fails
for every host — verified, see EVAL.md). The script detects that condition
and says so explicitly instead of half-failing. On any machine with network
access:

    python scripts/fetch_euroc.py --sequences MH_01 MH_02 V1_01
    python scripts/eval_ate.py --data datasets

downloads + evaluates end to end.
"""

from __future__ import annotations

import argparse
import os
import socket
import sys
import urllib.request
import zipfile

ASL = "http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset"

# sequence name -> (collection dir, archive stem)
EUROC = {
    "MH_01": ("machine_hall", "MH_01_easy"),
    "MH_02": ("machine_hall", "MH_02_easy"),
    "MH_03": ("machine_hall", "MH_03_medium"),
    "MH_04": ("machine_hall", "MH_04_difficult"),
    "MH_05": ("machine_hall", "MH_05_difficult"),
    "V1_01": ("vicon_room1", "V1_01_easy"),
    "V1_02": ("vicon_room1", "V1_02_medium"),
    "V1_03": ("vicon_room1", "V1_03_difficult"),
    "V2_01": ("vicon_room2", "V2_01_easy"),
    "V2_02": ("vicon_room2", "V2_02_medium"),
}

TUMVI = "https://cdn3.vision.in.tum.de/tumvi/exported/euroc/512_16"
TUMVI_SEQS = ["room1", "room2", "room3", "room4", "room5", "room6"]


def egress_available(timeout: float = 5.0) -> bool:
    try:
        socket.getaddrinfo("robotics.ethz.ch", 80)
        return True
    except OSError:
        return False


def fetch_euroc(seq: str, out_dir: str) -> str:
    coll, stem = EUROC[seq]
    url = f"{ASL}/{coll}/{stem}/{stem}.zip"
    dest_root = os.path.join(out_dir, seq)
    if os.path.isdir(os.path.join(dest_root, "mav0")):
        print(f"{seq}: already present")
        return dest_root
    os.makedirs(dest_root, exist_ok=True)
    zpath = os.path.join(dest_root, f"{stem}.zip")
    print(f"{seq}: downloading {url}")
    urllib.request.urlretrieve(url, zpath)
    print(f"{seq}: unpacking")
    with zipfile.ZipFile(zpath) as z:
        z.extractall(dest_root)
    os.remove(zpath)
    return dest_root


def fetch_tumvi(seq: str, out_dir: str) -> str:
    import tarfile

    name = f"dataset-{seq}_512_16"
    dest_root = os.path.join(out_dir, f"tumvi_{seq}")
    if os.path.isdir(os.path.join(dest_root, "mav0")):
        print(f"tumvi {seq}: already present")
        return dest_root
    os.makedirs(dest_root, exist_ok=True)
    url = f"{TUMVI}/{name}.tar"
    tpath = os.path.join(dest_root, f"{name}.tar")
    print(f"tumvi {seq}: downloading {url}")
    urllib.request.urlretrieve(url, tpath)
    with tarfile.open(tpath) as t:
        t.extractall(dest_root)
    os.remove(tpath)
    # archive nests <name>/mav0 — flatten one level
    nested = os.path.join(dest_root, name, "mav0")
    if os.path.isdir(nested) and not os.path.isdir(
            os.path.join(dest_root, "mav0")):
        os.rename(nested, os.path.join(dest_root, "mav0"))
    return dest_root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="datasets")
    ap.add_argument("--sequences", nargs="+",
                    default=["MH_01", "MH_02", "MH_03", "MH_04", "MH_05"],
                    help=f"EuRoC: {sorted(EUROC)}; TUM-VI: {TUMVI_SEQS}")
    args = ap.parse_args()

    if not egress_available():
        print(
            "ERROR: no network egress from this machine (DNS resolution "
            "fails). The build container has zero egress by policy — run "
            "this script on a machine with internet access, or copy "
            "pre-downloaded sequences into "
            f"{args.out}/<SEQ>/mav0/. See EVAL.md.",
            file=sys.stderr,
        )
        return 2

    os.makedirs(args.out, exist_ok=True)
    for seq in args.sequences:
        if seq in EUROC:
            fetch_euroc(seq, args.out)
        elif seq in TUMVI_SEQS:
            fetch_tumvi(seq, args.out)
        else:
            print(f"unknown sequence {seq}", file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
