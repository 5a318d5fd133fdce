#!/usr/bin/env bash
# Dataset acquisition (reference surface: scripts/download_atlas.sh).
#
# ATLAS MD ensembles are served per-protein by the DSIMB database; PED and
# PDB corpora plus the published N6/K3/K4 checkpoints are distributed by
# the upstream project via a Google Drive folder (see its README) that has
# no stable direct-download URL — fetch those by hand and point
# `--dest`-style paths at them.
#
# Usage:
#   scripts/download_datasets.sh atlas NAMES_FILE [DEST]
#       NAMES_FILE: one ATLAS entry per line ("1k5n_A"), or the upstream
#       atlas.csv ("name,seqres" header + "name,SEQ" rows — both accepted).
#       Downloads ${name}_protein.zip per entry (PDB + GROMACS xtc
#       trajectories), unpacks to DEST/${name}/ (default
#       datasets/protein/Atlas), resumes partial downloads, and skips
#       entries already unpacked — safe to re-run after interruption.
#   scripts/download_datasets.sh preprocess SRC_DIR OUT_DIR
#       Featurize everything downloaded into padded training shards
#       (our cli.preprocess; equivalent stage of the reference's
#       preproccess_*.py).
set -euo pipefail

ATLAS_BASE="https://www.dsimb.inserm.fr/ATLAS/database/ATLAS"

fetch() { # fetch URL OUT — curl or wget, resumable, fail loud but clean
    local url=$1 out=$2
    if command -v curl >/dev/null; then
        curl -fL --retry 3 -C - -o "$out" "$url"
    elif command -v wget >/dev/null; then
        wget -c -O "$out" "$url"
    else
        echo "error: neither curl nor wget available" >&2
        return 1
    fi
}

cmd=${1:-}
case "$cmd" in
atlas)
    names_file=${2:?usage: $0 atlas NAMES_FILE [DEST]}
    dest=${3:-datasets/protein/Atlas}
    mkdir -p "$dest"
    # accept both bare-name lines and the upstream CSV (skip its header)
    grep -v '^name,' "$names_file" | cut -d, -f1 | while read -r name; do
        [ -z "$name" ] && continue
        if [ -d "$dest/$name" ] && [ -n "$(ls -A "$dest/$name" 2>/dev/null)" ]; then
            echo "[skip] $name (already unpacked)"
            continue
        fi
        echo "[get ] $name"
        zip="$dest/${name}_protein.zip"
        if ! fetch "$ATLAS_BASE/$name/${name}_protein.zip" "$zip"; then
            echo "[fail] $name — network unreachable or entry missing; continuing" >&2
            rm -f "$zip"
            continue
        fi
        mkdir -p "$dest/$name"
        unzip -o -q "$zip" -d "$dest/$name"
        rm -f "$zip"
    done
    echo "done: $(find "$dest" -mindepth 1 -maxdepth 1 -type d | wc -l) entries in $dest"
    ;;
preprocess)
    src=${2:?usage: $0 preprocess SRC_DIR OUT_DIR}
    out=${3:?usage: $0 preprocess SRC_DIR OUT_DIR}
    python -m codlad_tpu.cli.preprocess --pdb_dir "$src" --out_dir "$out"
    ;;
*)
    sed -n '2,20p' "$0" | sed 's/^# \{0,1\}//'
    exit 1
    ;;
esac
