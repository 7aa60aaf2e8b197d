#!/usr/bin/env python3
"""Python twin of graft.tools.CanonDigest — recompute (and diff) the
canonical per-query digests of a graft.Verify dump.

Usage:
  python3 tools/digest_dump.py <verify_out_dir> [query ...]
      Recompute each query's canonical sorted-row SHA-256 from the dumped
      parquet and compare against digests.json (written by graft.Verify on
      whatever machine produced the dump). MATCH means this interpreter
      reconstructs the exact bytes the JVM hashed — the two artifacts hold
      identical engine results.

  python3 tools/digest_dump.py --diff <dir_a> <dir_b> [query ...]
      Compare two dumps (e.g. driver-run vs local-run) query by query and,
      where digests differ, print the first differing canonical rows —
      the human-readable divergence the bare hash_match boolean hides.

Canonical form (must stay byte-identical to CanonDigest.scala):
  columns sorted by name; header = names joined with \\x01; row = canonical
  values joined with \\x01 in sorted-column order; rows sorted as UTF-8
  bytes; digest = sha256(header + "\\n" + row + "\\n" ...).
Value tags: null "<null>"; bool T/F; ints as decimal; double "d:"+16-hex
IEEE bits; float32 "f:"+8-hex; Decimal plain string; str "s:"+verbatim; bytes
"x:"+hex; date ISO; timestamp "t:"+epoch-micros; list "[v,...]"; struct
"{v,...}" in schema order; map "{k=>v,...}" sorted by canonical key.
"""
import datetime
import glob
import hashlib
import json
import struct
import sys
from decimal import Decimal

import pyarrow.parquet as pq

_EPOCH = datetime.datetime(1970, 1, 1)


def canon_value(v, typ=None):
    # typ is the pyarrow type (for float32 vs float64 disambiguation and
    # struct field order); None for map keys already materialized
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if typ is not None and str(typ) == "float":
            return "f:" + struct.pack(">f", v).hex()
        return "d:" + struct.pack(">d", v).hex()
    if isinstance(v, int):
        return str(v)
    if isinstance(v, Decimal):
        return format(v, "f")
    if isinstance(v, str):
        return "s:" + v
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        td = v - _EPOCH
        return "t:%d" % (td.days * 86400_000_000
                         + td.seconds * 1_000_000 + td.microseconds)
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, dict):  # struct (insertion order == schema order)
        inner = getattr(typ, "field", None)
        vals = []
        for i, (_, fv) in enumerate(v.items()):
            ft = typ.field(i).type if inner else None
            vals.append(canon_value(fv, ft))
        return "{" + ",".join(vals) + "}"
    if isinstance(v, list):
        # decide map-ness from the TYPE, not v[0] sniffing: an empty map
        # materializes as [] and must still canonicalize as "{}" to match
        # CanonDigest.scala's Map branch
        import pyarrow.types as pat
        if typ is not None and pat.is_map(typ):
            kt, vt = typ.key_type, typ.item_type
            # UTF-8 byte order, matching CanonDigest's utf8Order. errors=
            # "replace" everywhere in this file: Java getBytes("UTF-8")
            # substitutes '?' for unpaired surrogates, and Python's
            # "replace" does the same — "surrogatepass" would emit WTF-8
            # bytes Java never produces and break the byte contract on
            # exactly the strings it was meant to cover
            ents = sorted((canon_value(k, kt) + "=>" + canon_value(x, vt)
                           for k, x in v),
                          key=lambda s: s.encode("utf-8", "replace"))
            return "{" + ",".join(ents) + "}"
        it = typ.value_type if typ is not None and hasattr(typ, "value_type") else None
        return "[" + ",".join(canon_value(x, it) for x in v) + "]"
    return str(v)


def canon_rows(qdir):
    files = sorted(glob.glob(f"{qdir}/*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet under {qdir}")
    import pyarrow as pa
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    names = tbl.column_names
    order = sorted(range(len(names)),
                   key=lambda i: names[i].encode("utf-8", "replace"))
    types = [tbl.schema.field(i).type for i in range(len(names))]
    pylist = tbl.to_pylist()
    rows = ["\x01".join(canon_value(r[names[i]], types[i]) for i in order)
            for r in pylist]
    rows.sort(key=lambda s: s.encode("utf-8", "replace"))
    header = "\x01".join(names[i] for i in order)
    return header, rows


def digest_of(qdir):
    header, rows = canon_rows(qdir)
    md = hashlib.sha256()
    md.update((header + "\n").encode("utf-8", "replace"))
    for r in rows:
        md.update((r + "\n").encode("utf-8", "replace"))
    return len(rows), md.hexdigest()


def queries_in(out_dir, only):
    try:
        with open(f"{out_dir}/digests.json") as f:
            names = sorted(json.load(f))
    except FileNotFoundError:
        names = sorted(p.rsplit("/", 1)[-1]
                       for p in glob.glob(f"{out_dir}/q*") if "/" in p)
    return [n for n in names if not only or n in only]


def mode_check(out_dir, only):
    with open(f"{out_dir}/digests.json") as f:
        recorded = json.load(f)
    n_match = n_diff = 0
    for name in queries_in(out_dir, only):
        rows, sha = digest_of(f"{out_dir}/{name}")
        rec = recorded.get(name, {})
        if rec.get("sha256") == sha and rec.get("rows") == rows:
            n_match += 1
        else:
            n_diff += 1
            print(f"DIFF {name}: recorded {rec.get('rows')}/"
                  f"{str(rec.get('sha256'))[:16]} vs recomputed {rows}/{sha[:16]}")
    print(f"== {n_match} match, {n_diff} differ")
    return 1 if n_diff else 0


def mode_diff(dir_a, dir_b, only, max_rows=5):
    names = sorted(set(queries_in(dir_a, only)) | set(queries_in(dir_b, only)))
    n_same = n_diff = 0
    for name in names:
        try:
            ha, ra = canon_rows(f"{dir_a}/{name}")
            hb, rb = canon_rows(f"{dir_b}/{name}")
        except FileNotFoundError as e:
            print(f"DIFF {name}: {e}")
            n_diff += 1
            continue
        if ha == hb and ra == rb:
            n_same += 1
            continue
        n_diff += 1
        if ha != hb:
            print(f"DIFF {name}: columns {ha.split(chr(1))} vs {hb.split(chr(1))}")
            continue
        sa, sb = set(ra), set(rb)
        only_a = [r for r in ra if r not in sb][:max_rows]
        only_b = [r for r in rb if r not in sa][:max_rows]
        print(f"DIFF {name}: {len(ra)} vs {len(rb)} rows; "
              f"{len(sa - sb)} only in A, {len(sb - sa)} only in B")
        for r in only_a:
            print(f"  A: {r.replace(chr(1), ' | ')}")
        for r in only_b:
            print(f"  B: {r.replace(chr(1), ' | ')}")
    print(f"== {n_same} identical, {n_diff} differ")
    return 1 if n_diff else 0


def main():
    args = sys.argv[1:]
    if args and args[0] == "--diff":
        sys.exit(mode_diff(args[1], args[2], set(args[3:])))
    sys.exit(mode_check(args[0], set(args[1:])))


if __name__ == "__main__":
    main()
