"""Convert the reference's captured reth workload profile to the swirl atlas.

Input: ``/root/reference/benchmarks/synthetic/reth-block-23992138-profile.jsonl``
(schema v2 — one ``SegmentProfile`` JSON per line, 209 segments / 6,382 AIR
records; see reference ``benchmarks/synthetic/src/segment_profile.rs``).

Output: ``benchmarks/reth-block-23992138-atlas.json`` — the swirl atlas
format consumed by :mod:`swirl.testing.synthetic` and
``benchmarks/synthetic_runner.py``: a list of segments, each a list of
per-AIR shape records capturing everything the prover's cost depends on
(heights, widths incl. preprocessed/cached, constraint counts/degrees,
interaction bus indices / message lengths / count weights).

Run once and check in the output; the converter stays for provenance.
"""

from __future__ import annotations

import json
import sys

SRC = "/root/reference/benchmarks/synthetic/reth-block-23992138-profile.jsonl"
DST = "benchmarks/reth-block-23992138-atlas.json"


def convert(src: str = SRC, dst: str = DST) -> None:
    segments = []
    with open(src) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            seg = json.loads(line)
            assert seg["schema"] == "v2", seg["schema"]
            airs = []
            for rec in seg["airs"]:
                w = rec["width"]
                assert not w.get("after_challenge"), "after_challenge unused in v2 SWIRL"
                airs.append(
                    {
                        "air_name": rec["air_name"],
                        "air_id": rec["air_id"],
                        "log_height": rec["log_height"],
                        "preprocessed_width": w["preprocessed"],
                        "cached_main_widths": w["cached_mains"],
                        "common_main_width": w["common_main"],
                        "num_constraints": rec["num_constraints"],
                        "num_interactions": rec["num_interactions"],
                        "max_constraint_degree": rec["max_constraint_degree"],
                        "buses": rec["buses"],
                        "interaction_message_lens": rec["interaction_message_lens"],
                        "interaction_count_weights": rec["interaction_count_weights"],
                    }
                )
            segments.append(
                {
                    "segment_idx": seg["segment_idx"],
                    "global_max_constraint_degree": seg["global_max_constraint_degree"],
                    "airs": airs,
                }
            )
    out = {
        "source": "reth-block-23992138-profile.jsonl (reference benchmarks/synthetic, schema v2)",
        "segments": segments,
    }
    with open(dst, "w") as f:
        json.dump(out, f, separators=(",", ":"))
    n_airs = sum(len(s["airs"]) for s in segments)
    print(f"wrote {dst}: {len(segments)} segments, {n_airs} AIR records")


if __name__ == "__main__":
    convert(*(sys.argv[1:] or []))
