"""Render benchmark results.json to a PNG graph + table
(reference: benchmark/visualize_results.py:6-118)."""
from __future__ import annotations

import argparse
import json
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="benchmark/results.json")
    ap.add_argument("--output-dir", default="benchmark")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = json.loads(Path(args.results).read_text())
    per_font = data["per_font"]
    names = list(per_font)
    accs = [per_font[n]["accuracy"] * 100 for n in names]
    speeds = [per_font[n]["ms_per_line"] for n in names]

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(14, 5))
    ax1.barh(names, accs, color="#4c72b0")
    ax1.set_xlabel("Character accuracy (%)")
    ax1.set_xlim(0, 100)
    ax1.set_title(f"Accuracy by font ({data['decode_method']})")
    ax2.barh(names, speeds, color="#55a868")
    ax2.set_xlabel("ms / line (batched)")
    ax2.set_title("Latency by font")
    fig.tight_layout()
    out = Path(args.output_dir)
    fig.savefig(out / "benchmark_graph.png", dpi=120)

    fig2, ax = plt.subplots(figsize=(10, 0.4 * len(names) + 1.5))
    ax.axis("off")
    rows = [[n, f"{per_font[n]['accuracy'] * 100:.1f}%",
             f"{per_font[n]['cer']:.4f}",
             f"{per_font[n]['ms_per_line']:.1f} ms",
             f"{per_font[n]['lines_per_sec']:.1f}/s"] for n in names]
    avg = data["average"]
    rows.append(["AVERAGE", f"{avg['accuracy'] * 100:.1f}%",
                 f"{avg['cer']:.4f}", f"{avg['ms_per_line']:.1f} ms",
                 f"{avg['lines_per_sec']:.1f}/s"])
    table = ax.table(cellText=rows,
                     colLabels=["Font", "Accuracy", "CER", "Speed", "Rate"],
                     loc="center")
    table.auto_set_font_size(False)
    table.set_fontsize(9)
    fig2.tight_layout()
    fig2.savefig(out / "benchmark_table.png", dpi=120)
    print(f"✓ Graphs -> {out}/benchmark_graph.png, benchmark_table.png")


if __name__ == "__main__":
    main()
