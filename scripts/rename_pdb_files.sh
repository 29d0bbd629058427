#!/usr/bin/env bash
# Post-process an rsync'd RCSB mirror (`/root/reference/rename_pdb_files.sh`
# + README.md:14): gunzip every pdb*.ent.gz and strip the "pdb" prefix and
# ".ent" suffix, leaving <id>.pdb files in place.
#
# Usage: scripts/rename_pdb_files.sh <mirror_root>
set -euo pipefail
root="${1:?usage: rename_pdb_files.sh <mirror_root>}"
find "$root" -name '*.ent.gz' -print0 | xargs -0 -r -P "$(nproc)" gunzip
find "$root" -name 'pdb*.ent' -print0 | while IFS= read -r -d '' f; do
  dir=$(dirname "$f")
  base=$(basename "$f")
  id="${base#pdb}"
  id="${id%.ent}"
  mv "$f" "$dir/$id.pdb"
done
echo "renamed $(find "$root" -name '*.pdb' | wc -l) pdb files under $root"
