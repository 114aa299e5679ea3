"""Result rendering: box overlays, text overlay, HTML report.

API parity with the reference DocumentRenderer (kiri_ocr/renderer.py:6-197):
``draw_boxes`` (confidence-colored rectangles), ``draw_results`` (side-by-side
text overlay), ``create_report`` (standalone HTML). Implemented with PIL only
(no cv2 dependency); colors follow the reference's confidence scheme
(>0.9 green, >0.7 orange, else red).
"""
from __future__ import annotations

import base64
import html
import io
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
from PIL import Image, ImageDraw, ImageFont


def _conf_color(conf: float):
    if conf > 0.9:
        return (0, 200, 0)
    if conf > 0.7:
        return (255, 165, 0)
    return (220, 0, 0)


class DocumentRenderer:
    """Render OCR results onto document images."""

    def __init__(self, font_path: Optional[str] = None, font_size: int = 12):
        self.font_size = font_size
        self.font = None
        candidates = []
        if font_path:
            candidates.append(font_path)
        if Path("fonts").exists():
            candidates += [str(f) for f in Path("fonts").glob("*.ttf")]
        candidates += [
            "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
            "DejaVuSans.ttf",
        ]
        for cand in candidates:
            try:
                self.font = ImageFont.truetype(cand, font_size)
                break
            except Exception:
                continue
        if self.font is None:
            self.font = ImageFont.load_default()
        # Khmer overlay fallback (reference renderer.py:21-41 hunts for a
        # Khmer-capable system font): route Khmer text through a font that
        # can draw it — a real Khmer TTF if the default can't, else the
        # deterministic pseudo-glyph pool the generators use.
        self._khmer_font = None

    _KHMER = (0x1780, 0x17FF)

    def _font_for(self, text: str):
        if not any(self._KHMER[0] <= ord(c) <= self._KHMER[1] for c in text):
            return self.font
        if self._khmer_font is None:
            try:
                from .data.synth import FontManager

                fm = FontManager()
                path = fm.khmer_fonts[0] if fm.khmer_fonts else None
                self._khmer_font = (fm.get(path, max(12, self.font_size))
                                    if path else self.font)
            except Exception:
                self._khmer_font = self.font
        return self._khmer_font

    @staticmethod
    def _load_rgb(image_path) -> Image.Image:
        return Image.open(image_path).convert("RGB")

    def draw_boxes(self, image_path, results: List[Dict],
                   output_path: str = "output_boxes.png") -> str:
        """Confidence-colored bounding boxes (reference renderer.py:44-75)."""
        img = self._load_rgb(image_path)
        draw = ImageDraw.Draw(img)
        for r in results:
            x, y, w, h = r["box"]
            color = _conf_color(r.get("confidence", 0.0))
            draw.rectangle([x, y, x + w, y + h], outline=color, width=2)
            label = f"{r.get('confidence', 0) * 100:.0f}%"
            draw.text((x, max(0, y - self.font_size - 2)), label,
                      fill=color, font=self.font)
        img.save(output_path)
        return str(output_path)

    def draw_results(self, image_path, results: List[Dict],
                     output_path: str = "output_ocr.png",
                     show_text: bool = True,
                     show_confidence: bool = True) -> str:
        """Original image + recognized text overlay side-by-side.

        Matches the reference signature (renderer.py:72-73): ``show_text``
        suppresses the text overlay entirely (boxes only), and
        ``show_confidence`` appends the confidence percentage to each label.
        """
        img = self._load_rgb(image_path)
        width = img.width * 2 + 10 if show_text else img.width
        canvas = Image.new("RGB", (width, img.height), (255, 255, 255))
        canvas.paste(img, (0, 0))
        draw = ImageDraw.Draw(canvas)
        xoff = img.width + 10
        for r in results:
            x, y, w, h = r["box"]
            color = _conf_color(r.get("confidence", 0.0))
            draw.rectangle([x, y, x + w, y + h], outline=color, width=2)
            if not show_text:
                continue
            text = r.get("text", "")[:50]
            if show_confidence:
                text += f" ({r.get('confidence', 0.0) * 100:.0f}%)"
            draw.rectangle([xoff + x, y, xoff + x + w, y + h],
                           outline=(200, 200, 200), width=1)
            draw.text((xoff + x + 2, y + max(0, (h - self.font_size) // 2)),
                      text, fill=(0, 0, 0), font=self._font_for(text))
        canvas.save(output_path)
        return str(output_path)

    def create_report(self, image_path, results: List[Dict],
                      output_path: str = "report.html") -> str:
        """Standalone HTML report with embedded image and result table
        (reference renderer.py:131-197)."""
        img = self._load_rgb(image_path)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode("ascii")

        rows = []
        for r in results:
            conf = r.get("confidence", 0.0)
            color = "#0c0" if conf > 0.9 else ("#fa0" if conf > 0.7 else "#d00")
            rows.append(
                f"<tr><td>{r.get('line_number', '')}</td>"
                f"<td>{html.escape(r.get('text', ''))}</td>"
                f"<td style='color:{color}'>{conf * 100:.1f}%</td>"
                f"<td>{r['box']}</td></tr>")
        avg = (float(np.mean([r.get("confidence", 0) for r in results]))
               if results else 0.0)
        doc = f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Kiri-TPU OCR Report</title>
<style>
 body {{ font-family: sans-serif; margin: 2em; }}
 table {{ border-collapse: collapse; width: 100%; }}
 td, th {{ border: 1px solid #ccc; padding: 4px 8px; }}
 img {{ max-width: 100%; border: 1px solid #999; }}
</style></head><body>
<h1>OCR Report</h1>
<p>Source: {html.escape(str(image_path))} —
 {len(results)} regions, average confidence {avg * 100:.1f}%</p>
<img src="data:image/png;base64,{b64}" alt="document"/>
<table><tr><th>#</th><th>Text</th><th>Confidence</th><th>Box</th></tr>
{''.join(rows)}
</table></body></html>"""
        Path(output_path).write_text(doc, encoding="utf-8")
        return str(output_path)
