"""Track utilities: mask-track interval merging (union) across several tracks.

Equivalent of merge_size/merge_tracks (reference damapper.c:143-343): a k-way
merge of per-read interval lists producing the union of the masked intervals.
"""

from __future__ import annotations

import numpy as np


def merge_mask_tracks(db) -> None:
    """Replace all mask tracks on `db` with a single merged 'merge' track
    holding the per-read union of intervals (damapper.c:253-343)."""
    names = list(db.tracks.keys())
    if len(names) <= 1:
        return
    n = db.nreads
    out_anno = np.zeros(n + 1, np.int64)
    out_chunks: list[np.ndarray] = []
    total = 0
    tracks = [db.tracks[nm] for nm in names]
    for r in range(n):
        events = []
        for anno, data, _ in tracks:
            seg = data[int(anno[r]):int(anno[r + 1])]
            for j in range(0, len(seg) - 1, 2):
                events.append((int(seg[j]), int(seg[j + 1])))
        events.sort()
        merged = []
        for b, e in events:
            if merged and b <= merged[-1][1]:
                if e > merged[-1][1]:
                    merged[-1] = (merged[-1][0], e)
            else:
                merged.append((b, e))
        flat = np.array([x for iv in merged for x in iv], np.int32)
        out_anno[r] = total
        out_chunks.append(flat)
        total += len(flat)
    out_anno[n] = total
    data = np.concatenate(out_chunks) if out_chunks else np.zeros(0, np.int32)
    db.tracks.clear()
    db.tracks["merge"] = (out_anno,
                          data,
                          np.diff(out_anno).astype(np.int32))
