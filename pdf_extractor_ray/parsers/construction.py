"""Construction-item extraction: line classifier + doc-local state machine.

Re-expresses the semantics of the reference's rule cascade
(reference: extractor/parsers/construction.py:153-829) as a
data-driven classifier.  The decision ORDER and tie-breaks are frozen
— longest-match fixture selection, spec-decimal shadowing of
quantities, greedy first-match-wins per pattern family, drawing-
reference demotion — because item output must be deterministic per
document (SURVEY.md §7.5.1).

All state is document-local: ``extract_items`` holds one open item at
a time and flushes it on the next detection or EOF (reference
:169-213), so documents parse embarrassingly parallel inside
``map_batches``; nothing here touches Ray.

Patterns are compiled once per parser instance (the actor-pool warm
state, reference :13-151 / SURVEY.md A3).
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

Item = Dict[str, Any]

# ---------------------------------------------------------------- pattern data
# Order within each bank is semantic: first match wins (quantity, dims,
# mounting, spec) or longest match wins (fixtures).

_EXCLUDE = (
    r"\b(prohibited|copyright|reserved|confidential|proprietary)\b",
    r"\b(use\s+in\s+whole|in\s+part|strictly\s+prohibited)\b",
    r"\b(all\s+rights\s+reserved|page\s+\d+|document\s+control)\b",
    r"\b(revision|date|prepared\s+by|approved\s+by)\b",
    r"^[A-Z\s]{20,}$",
    r"^\d+$",
    r"^[^\w\s]+$",
    r"^\s*(up\s+to|see\s+|refer\s+to|see\s+page|refer\s+page|see\s+drawing"
    r"|refer\s+drawing|see\s+spec|refer\s+spec)\b",
    r"^\s*(note:|notice:|warning:|caution:)\b",
    r"^\s*(see|refer|use|install|mount|connect)\s+[A-Z0-9\-]+",
)

_INSTRUCTION_PREFIXES = (
    "UP TO", "SEE", "REFER TO", "SEE PAGE", "REFER PAGE", "SEE DRAWING",
    "REFER DRAWING", "SEE SPEC", "REFER SPEC", "USE", "INSTALL", "MOUNT",
    "CONNECT", "NOTE:", "NOTICE:",
)

_FIXTURE = (
    r"\b(pipe|fitting|duct|conduit|fixture|valve|faucet|sink|toilet|shower"
    r"|bathtub|drain|vent|elbow|tee|coupling|reducer|adapter|cap|plug|flange"
    r"|gasket|hanger|bracket|mount)\b",
    r"\b(pump|circulating\s+pump|booster\s+pump|centrifugal\s+pump|pump\s+package)\b",
    r"\b(equipment|boiler|heater|tower|cooling\s+tower|tank|reservoir|vessel|chiller)\b",
    r"\b(station|wash\s+station|eye\s+wash|safety\s+station|emergency\s+station)\b",
    r"\b(connection|fixture\s+connection|piping\s+connection|cooling\s+connection)\b",
    r"\b(package|valve\s+package|equipment\s+package|fixture\s+package)\b",
    r"\b(shop\s+fixture|repair\s+shop|body\s+shop|paint\s+booth|booth\s+equipment)\b",
    r"\b(fixtures|body\s+repair|paint\s+equipment|mechanical\s+equipment)\b",
    r"\b(ABS|PVC|CPVC|PEX|copper|steel|stainless|galvanized|cast\s+iron|brass|bronze)\b",
    r"\b(item|component|part|unit|assembly|system)\b",
)

_QUANTITY = (
    r"\b(?:qty|quantity|qty\.)[:\s]+(\d+(?:\.\d+)?)\b",
    r"\b(?:qty|quantity)[:\s]+(\d+(?:\.\d+)?)\s*(?:ea|each|pcs|pieces|unit|units)?\b",
    r"\b(\d+)\s*(?:ea|each|pcs|pieces|pc|unit|units)\b",
    r"\b(\d+)\s*(?:lf|linear feet|ft|feet|sq ft|sq\.?\s*ft\.?|square feet)\b",
    r"(?<!-)(?<![A-Z])\b(\d+\.\d+)(?:\s*,\s*\d+(?:\.\d+)?)*\b(?![-A-Z])",
    r"\((\d+)\)(?:\s|$)",
    r"\b[A-Z][A-Za-z\s]+\s*\((\d+)\)",
    r"(?:^|\s|,|:)\s*(\d{1,3})\s*(?:ea|each|pcs|pieces|qty|quantity|unit|units|$)",
)

_MODEL = (
    r"\b(model|part\s*#|part\s*number|pn|sku|cat\s*#|catalog\s*#|item\s*#)[:\s]+([A-Z0-9\-\.]+)",
    r"\b([A-Z]{2,}-\d+[A-Z0-9\-]*)\b",
    r"\b([A-Z]{1,3}\d{2,}[A-Z0-9]*)\b",
    r"\b([A-Z]{2,}\d+[A-Z0-9])\b",
)

_DIMENSION = (
    r"\b(\d+)\s*[\"']\s*[-–]\s*(\d+)\s*(\d+\/\d+)\s*[\"']",
    r"\b(\d+)\s*[\"']\s*[-–]\s*(\d+)\s*[\"']",
    r"\b(\d+)\s*[\"']\s+(\d+)\s*(\d+\/\d+)\s*[\"']",
    r"\b(\d+)\s*[\"']\s+(\d+)\s*[\"']",
    r"\b(\d+)\s*[\"']\s*[-–]\s*(\d+)\s*(\d+\/\d+)\b",
    r"\b(\d+)\s*[\"']\s*[-–]?\s*(\d+)\s*(\d+\/\d+)\s*[\"']?\b",
    r"\b(\d+[\/\.]\d+|\d+(?:\.\d+)?)\s*[\"']?\s*x\s*(\d+[\/\.]\d+|\d+(?:\.\d+)?)"
    r"\s*[\"']?\s*x\s*(\d+[\/\.]\d+|\d+(?:\.\d+)?)\s*[\"']?\b",
    r"\b(\d+[\/\.]\d+|\d+(?:\.\d+)?)\s*[\"']?\s*x\s*(\d+[\/\.]\d+|\d+(?:\.\d+)?)\s*[\"']?\b",
    r"\b(\d+[\/\.]\d+|\d+(?:\.\d+)?)\s*[\"']\s*(?:diameter|dia|OD|ID|D|DIA)\b",
    r"\b(\d+[\/\.]\d+|\d+(?:\.\d+)?)\s*inch(es)?\s*(?:diameter|dia|OD|ID)\b",
    r"\b(?:diameter|dia|OD|ID|D|DIA)[\s:]+(\d+[\/\.]\d+|\d+(?:\.\d+)?)\s*[\"']?\b",
    r"\b(\d+(?:\.\d+)?)\s*[\"'](?!\s*x)(?![A-Z0-9])",
    r"\b(\d+(?:\.\d+)?)\s*(?:inch|inches|in|ft|feet|cm|mm)\b",
    r"\b(\d+\s*[\/\-]\s*\d+\/\d+)\s*[\"']\b",
    r"(\d+\s+\d+\/\d+\s*[\"']?\s*ø)",
    r"(\d+[- ]\d+\/\d+\s*[\"']?\s*ø)",
    r"(\d+\/\d+\s*[\"']?\s*ø)",
    r"(\d+\s*[\"']?\s*ø)",
    r"(?:diameter|dia|OD|ID|size|dimension)[:\s]+(\d+\/\d+)\s*[\"']?",
    r"(?:\d+\s+)?(\d+\/\d+)\s*[\"']\s*(?:diameter|dia|OD|ID|inch|inches)",
    r"\b(\d+(?:\.\d+)?)\s*(?:mm|cm|m)\s*x\s*(\d+(?:\.\d+)?)\s*(?:mm|cm|m)\b",
)

# full-string dimension rescans, most-specific first (reference :431-447)
_DIMENSION_FULL = (
    r"(\d+\s+\d+\/\d+\s*[\"']?\s*ø)",
    r"(\d+[- ]\d+\/\d+\s*[\"']?\s*ø)",
    r"(\d+\/\d+\s*[\"']?\s*ø)",
    r"(\d+\s*[\"']?\s*ø)",
    r"(\d+\s*[\"']\s*[-–]\s*\d+\s+\d+\/\d+\s*[\"'])",
    r"(\d+\s*[\"']\s*[-–]\s*\d+\s*[\"'])",
    r"(\d+\s*[\"']\s+\d+\s+\d+\/\d+\s*[\"'])",
    r"(\d+\s*[\"']\s+\d+\s*[\"'])",
    r"(\d+\s*[\"']\s*[-–]?\s*\d+\s*\d+\/\d+)",
    r"(\d+\s*[\"']\s*[-–]?\s*\d+\s*\d+\/\d+\s*[\"']?)",
    r"(?:[=:]\s*)(\d+\s*[\"']\s*[-–]?\s*\d+\s*\d+\/\d+\s*[\"']?)",
    r"(?:[=:]\s*)(\d+\s*[\"']\s*[-–]?\s*\d+\s*[\"']?)",
)

_MOUNTING = (
    r"\b(wall[-\s]*(?:hung|mount|mounted|mounting))\b",
    r"\b(floor[-\s]*(?:mount|mounted|mounting))\b",
    r"\b(ceiling[-\s]*(?:mount|mounted|mounting))\b",
    r"\b(surface[-\s]*(?:mount|mounted|mounting))\b",
    r"\b(recessed|concealed|exposed|flush|flush[-\s]mount|undercounter|countertop"
    r"|freestanding|portable|stationary|fixed|removable|slip[-\s]on|threaded"
    r"|welded|bolted|hanging|suspended|ceiling[-\s]hung)\b",
    r"\b(mounting[-\s]type[:\s]+)(wall|floor|ceiling|surface|recessed|exposed)\b",
)

_SPEC = (
    r"\b(ASTM|ANSI|UL|CSA|ASME|NEMA|NFPA|AWWA|IPC|ISO|DIN|BS)[\s\-]?([A-Z0-9\.\-]+)",
    r"\b(grade|class|type|rating)\s+([A-Z0-9]+)",
    r"\b(spec[\.:]?\s*#?|specification[:\s]*|ref[\.:]?\s*#?|reference[:\s]*)([A-Z0-9\.\-]+)",
    r"\b(dwg[\.:]?\s*#?|drawing[:\s]*)([A-Z0-9\.\-]+)",
    r"\b(\d+\.\d+)(?:\s|$|,|;|:)(?!\s*(?:ea|each|pcs|pieces|qty|quantity))",
    r"\b(page\s+#?|pg[\.:]?\s*#?|p[\.:]?\s*#?)(\d+)",
    r"\b(see\s+)?(?:page|pg|p)\.?\s*(\d+)",
    r"\b(\d+)[\s\-]+(?:page|pg)\b",
)

_DRAWING_REF = (
    r"^[A-Z]\d+[-\.][A-Z]+[-\.]",
    r"^LINE\s+\d+",
    r"^DWG[-\.]\d+",
    r"^[A-Z]+\d*[-\.]MP[-\.]",
)

_LEGAL_WORDS = ("PROHIBITED", "COPYRIGHT", "RESERVED", "CONFIDENTIAL", "USE IN")
_NOISE_PHRASES = (
    "OR USE", "USE IN", "IN WHOLE", "IN PART", "PROHIBITED", "COPYRIGHT",
    "ALL RIGHTS", "RESERVED", "CONFIDENTIAL", "STRICTLY PROHIBITED",
    "WITHOUT WRITTEN",
)


def _compile(bank) -> tuple:
    return tuple(re.compile(p, re.IGNORECASE) for p in bank)


def squeeze_repeated_words(phrase: str) -> str:
    """Drop consecutive case-insensitive duplicate words
    ("VALVE VALVE PACKAGE" → "VALVE PACKAGE"; reference :264-271)."""
    out: List[str] = []
    prev: Optional[str] = None
    for w in phrase.split():
        if w.upper() != prev:
            out.append(w)
            prev = w.upper()
    return " ".join(out)


class ConstructionItemParser:
    """Stateless-across-documents item parser; compile-once pattern bank."""

    def __init__(self) -> None:
        self.exclude = _compile(_EXCLUDE)
        self.fixture = _compile(_FIXTURE)
        self.quantity = _compile(_QUANTITY)
        self.model = _compile(_MODEL)
        self.dimension = _compile(_DIMENSION)
        self.dimension_full = _compile(_DIMENSION_FULL)
        self.mounting = _compile(_MOUNTING)
        self.spec = _compile(_SPEC)
        self.drawing_ref = _compile(_DRAWING_REF)
        self._model_in_line = (
            re.compile(r"[A-Z]{2,}-\d+", re.IGNORECASE),
            re.compile(r"[A-Z]{1,3}\d{2,}", re.IGNORECASE),
        )
        self._qty_with_unit = re.compile(
            r"\b(\d+)\s*(ea|each|pcs|pieces|qty|quantity)", re.IGNORECASE
        )
        self._dim_shape = re.compile(r"\d+\s*[\"']\s*[-–]?\s*\d+")
        self._numeric_only = re.compile(r"^[\d\s'\"\-\/\.]+$")

    # ---------------------------------------------------------------- fixture
    def _find_fixture(self, line: str, out: Item) -> Optional[str]:
        """Longest fixture keyword match wins (reference :246-273)."""
        best = ""
        for pat in self.fixture:
            for m in pat.finditer(line):
                cand = m.group(0).strip()
                if len(cand) > len(best):
                    best = cand
        if best:
            lead = re.search(
                r"\b([A-Z][A-Za-z\s]+?)\s*(?:" + re.escape(best)
                + r"|package|equipment|fixture|station|connection)",
                line,
                re.IGNORECASE,
            )
            if lead:
                out["type"] = squeeze_repeated_words(
                    lead.group(1).strip() + " " + best
                ).title()
            else:
                out["type"] = best.title()
            return best
        # fallback: capitalized multi-word phrase, guarded against
        # dimension shapes and pure-numeric strings (reference :276-292)
        cap = re.search(r"\b([A-Z][A-Za-z]+(?:\s+[A-Z][A-Za-z]+)+)", line)
        if cap:
            phrase = cap.group(1).strip()
            if (
                len(phrase.split()) >= 2
                and len(phrase) > 10
                and not self._dim_shape.search(phrase)
                and not self._numeric_only.match(phrase)
            ):
                out["type"] = phrase
        return None

    # --------------------------------------------------------------- quantity
    def _find_quantity(self, line: str, out: Item) -> None:
        """First match wins; numbers inside model codes and spec decimals
        are shadowed out (reference :294-351)."""
        for pat in self.quantity:
            m = pat.search(line)
            if not m:
                continue
            qty = m.group(1)
            part_of_model = any(
                mp.search(line) and qty in mp.search(line).group()
                for mp in self._model_in_line
            )
            before = line[: m.start()].strip().upper()
            if any(before.endswith(p) for p in ("UP TO", "SEE", "REFER TO", "USE")):
                part_of_model = True
            spec_shadow = False
            if out.get("_spec_decimal") and qty in (out["_spec_decimal"], out.get("spec", "")):
                spec_shadow = True
            elif "." in qty and not re.search(
                r"\b(qty|quantity)[:\s]*\d+\.\d+", line, re.IGNORECASE
            ):
                if re.search(r"\d+\s*[\"']|OM-|MAU-|CH\d+|model|part\s*#", line, re.IGNORECASE):
                    spec_shadow = True
                    out.setdefault("spec", qty)
                    out.setdefault("_spec_decimal", qty)
            if part_of_model or spec_shadow:
                continue
            out["quantity"] = qty if "." in qty else int(qty)
            return

    # ----------------------------------------------------------------- models
    def _valid_short_code(self, model: str, line: str) -> bool:
        """Guards for bare letter+digits codes like L01/CH30
        (legal text, location codes; reference :370-386)."""
        upper = line.upper()
        if any(w in upper for w in _LEGAL_WORDS):
            return False
        if not re.search(r"\b(model|part|pn|sku|cat|item\s*#)", line, re.IGNORECASE):
            return False
        if len(line.strip().split()) <= 2 and model.upper() in upper:
            return False
        return True

    def _find_models(self, line: str, out: Item) -> None:
        """Empirically the reference only ever collects bare short codes
        (``^[A-Z]\\d+$``, len<=4) that pass the legal/location guards;
        longer candidates end the group scan without collecting
        (reference :353-405 — the append sits inside the short-code
        branch).  Reproduced exactly; long model numbers reach items
        via context-line enrichment instead (:669-685)."""
        found: List[str] = []
        for pat in self.model:
            for m in pat.finditer(line):
                for g in reversed(m.groups()):
                    if not (g and g.strip()):
                        continue
                    model = g.strip()
                    if re.match(r"^\d+$", model) or not (1 < len(model) < 50):
                        continue  # structurally invalid: try earlier group
                    if len(model) <= 4 and re.match(r"^[A-Z]\d+$", model):
                        if not self._valid_short_code(model, line):
                            continue
                        if (
                            re.search(r"[A-Z]", model)
                            and re.search(r"\d", model)
                            and model not in found
                        ):
                            found.append(model)
                    break  # one structurally-valid group ends this match
        if found:
            out["model"] = ", ".join(found[:2])  # top-2 distinct (reference :405)

    # ------------------------------------------------------------- dimensions
    def _find_dimensions(self, line: str, out: Item) -> None:
        for pat in self.dimension:
            m = pat.search(line)
            if not m:
                continue
            parts = [d for d in m.groups() if d]
            if not parts:
                continue
            kept = []
            for dim in parts:
                if "/" in dim and len(dim) <= 4:
                    has_model = bool(
                        re.search(r"[A-Z]{2,}-\d+|[A-Z]{1,3}\d{2,}", line, re.IGNORECASE)
                    )
                    has_instr = any(p in line.upper() for p in ("UP TO", "SEE", "REFER TO"))
                    if (has_model or has_instr) and not re.search(
                        r"(diameter|dia|OD|ID|size|dimension|inch|inches|x\s*\d)",
                        line,
                        re.IGNORECASE,
                    ):
                        continue
                kept.append(dim)
            if not kept:
                continue
            full = next(
                (
                    fm.group(1).strip()
                    for fp in self.dimension_full
                    if (fm := fp.search(line))
                ),
                None,
            )
            if full:
                out["dimensions"] = full
            elif len(kept) >= 2:
                out["dimensions"] = " x ".join(kept)
            else:
                single = kept[0]
                standalone = bool(re.match(r"^\d+$", single.strip()))
                ctx = bool(
                    re.search(
                        r"[\"']|inch|inches|in|feet|ft|cm|mm|diameter|dia|ø|x\s*\d",
                        line,
                        re.IGNORECASE,
                    )
                )
                units = bool(re.search(r"[\"']|ø|inch|in|ft|cm|mm", single, re.IGNORECASE))
                if units or (ctx and not standalone):
                    out["dimensions"] = single
                else:
                    continue  # bare number: quantity/spec/noise, keep scanning
            return

    # --------------------------------------------------------------- mounting
    def _find_mounting(self, line: str, out: Item) -> None:
        for pat in self.mounting:
            m = pat.search(line)
            if m:
                out["mounting"] = m.group(0).strip()
                return

    # ------------------------------------------------------------------- spec
    def _find_spec(self, line: str, out: Item) -> None:
        for pat in self.spec:
            m = pat.search(line)
            if not m:
                continue
            groups = [g for g in m.groups() if g]
            spec = " ".join(groups).strip() if groups else m.group(0).strip()
            if spec:
                out["spec"] = spec
                if re.match(r"^\d+\.\d+$", spec):
                    out["_spec_decimal"] = spec
                return

    # -------------------------------------------------------------- classifier
    def detect_item_line(self, line: str) -> Optional[Item]:
        """One line → item fields or None; frozen decision order."""
        for pat in self.exclude:
            if pat.search(line):
                return None
        upper = line.upper().strip()
        if any(upper.startswith(p) for p in _INSTRUCTION_PREFIXES):
            return None
        if re.match(
            r"^\s*(up\s+to|see|refer|use|install|mount|connect|note|notice|warning)\s+",
            line,
            re.IGNORECASE,
        ):
            return None
        if len(line.strip()) < 3:
            return None

        out: Item = {}
        fixture_hit = self._find_fixture(line, out)
        self._find_quantity(line, out)
        self._find_models(line, out)
        self._find_dimensions(line, out)
        self._find_mounting(line, out)
        self._find_spec(line, out)

        # late instruction screen (reference :516-533)
        if any(
            (
                upper.startswith(("UP TO", "SEE ", "REFER ", "USE ", "INSTALL ", "MOUNT ", "CONNECT ")),
                "SEE PAGE" in upper,
                "SEE DRAWING" in upper,
                "SEE SPEC" in upper,
                "REFER TO" in upper,
            )
        ):
            return None

        # drawing-reference demotion (reference :535-559)
        if any(p.match(upper) for p in self.drawing_ref):
            if upper == line.strip().upper():
                out.setdefault("spec", line.strip())
                if out.get("type") == line.strip():
                    out.pop("type", None)
                if not (out.get("model") or out.get("quantity") or out.get("dimensions")):
                    return None
            elif not (out.get("model") and (out.get("quantity") or out.get("dimensions"))):
                return None

        # strong-indicator gate (reference :561-594)
        strong = bool(out.get("type") and fixture_hit)
        strong = strong or bool(out.get("quantity") and out.get("model"))
        if out.get("model") and (
            out.get("mounting") or out.get("spec") or out.get("type") or out.get("quantity")
        ):
            strong = True
        if out.get("quantity") and self._qty_with_unit.search(line):
            strong = True
        if not strong:
            return None

        # fallback type from the first three words (reference :596-622)
        if not out.get("type") and (out.get("quantity") or out.get("model")):
            head = " ".join(line.split()[:3]).strip()
            if head:
                bad = (
                    any(p in head.upper() for p in _NOISE_PHRASES)
                    or self._dim_shape.search(head)
                    or self._numeric_only.match(head.strip())
                )
                if not bad and len(head) < 40:
                    out["type"] = head

        out.pop("_spec_decimal", None)
        # NOTE: the reference's final quantity-vs-spec dedup (:628-633)
        # compares against a key that is never set at that point, so a
        # decimal can legitimately appear as BOTH quantity and spec —
        # verified empirically against the reference parser; kept as-is.
        if out.get("type"):
            out["type"] = squeeze_repeated_words(out["type"])
        return out

    # --------------------------------------------------- document state machine
    def extract_items(self, text: str, page_num: int) -> List[Item]:
        """Lines → items; one open item at a time, enriched from the
        previous/current/next context lines (reference :153-214)."""
        items: List[Item] = []
        lines = text.split("\n")
        current: Optional[Item] = None

        def keepable(it: Optional[Item]) -> bool:
            return bool(
                it and (it.get("fixture_type") or it.get("model_number") or it.get("quantity"))
            )

        for line_num, raw in enumerate(lines):
            line = raw.strip()
            if not line:
                continue
            hit = self.detect_item_line(line)
            if hit:
                if keepable(current):
                    items.append(current)
                current = {
                    "fixture_type": hit.get("type"),
                    "quantity": hit.get("quantity"),
                    "model_number": hit.get("model"),
                    "dimensions": hit.get("dimensions"),
                    "mounting_type": hit.get("mounting"),
                    "spec_reference": hit.get("spec"),
                    "page_number": page_num,
                    "raw_text": line,
                    "line_number": line_num + 1,
                }
            elif current is not None:
                ctx = []
                if line_num > 0:
                    ctx.append(lines[line_num - 1].strip())
                ctx.append(line)
                if line_num + 1 < len(lines):
                    ctx.append(lines[line_num + 1].strip())
                for c in ctx:
                    if c:
                        self.enrich_item(current, c)
        if keepable(current):
            items.append(current)
        return items

    # ----------------------------------------------------------------- enrich
    def enrich_item(self, item: Item, line: str) -> None:
        """Fill missing fields from a context line (reference :651-758)."""
        if not item.get("quantity"):
            for pat in self.quantity:
                m = pat.search(line)
                if m:
                    qty = m.group(1)
                    try:
                        item["quantity"] = qty if "." in qty else int(qty)
                    except ValueError:
                        pass
                    break
        if not item.get("model_number"):
            for pat in self.model:
                m = pat.search(line)
                if m:
                    val = next(
                        (g.strip() for g in reversed(m.groups()) if g and g.strip()),
                        m.group(0).strip(),
                    )
                    item["model_number"] = val
                    break
        if not item.get("dimensions"):
            for pat in self.dimension:
                m = pat.search(line)
                if m:
                    parts = [d.strip() for d in m.groups() if d and d.strip()]
                    if parts:
                        if len(parts) > 1:
                            item["dimensions"] = " x ".join(parts)
                        else:
                            single = parts[0]
                            standalone = bool(re.match(r"^\d+$", single))
                            units = bool(
                                re.search(
                                    r"[\"']|ø|inch|inches|in|ft|feet|cm|mm|diameter|dia",
                                    single,
                                    re.IGNORECASE,
                                )
                            )
                            ctx = bool(
                                re.search(
                                    r"(diameter|dia|OD|ID|inch|in|\"|'|ø|x\s*\d)",
                                    line,
                                    re.IGNORECASE,
                                )
                            )
                            if units or (ctx and not standalone):
                                item["dimensions"] = single
                    break
        if not item.get("mounting_type"):
            for pat in self.mounting:
                m = pat.search(line)
                if m:
                    mt = m.group(0).strip()
                    if mt:
                        # canonical form: runs of space/hyphen → "-",
                        # mounting→mount, hung→mount, Title-Case
                        # (reference :725-729)
                        mt = re.sub(r"[-\s]+", "-", mt.lower())
                        mt = mt.replace("mounting", "mount").replace("hung", "mount")
                        item["mounting_type"] = mt.title()
                    break
        if not item.get("spec_reference"):
            for pat in self.spec:
                m = pat.search(line)
                if m:
                    groups = [g for g in m.groups() if g]
                    spec = " ".join(groups).strip() if groups else m.group(0).strip()
                    if spec:
                        item["spec_reference"] = spec
                    if "page" in pat.pattern.lower() or "pg" in pat.pattern.lower():
                        pm = re.search(r"\d+", spec)
                        if pm:
                            try:
                                item["page_number"] = int(pm.group())
                            except ValueError:
                                pass
                    break

    # ------------------------------------------------------------ table rows
    # header keyword → canonical field (broadcast-tiny constant; reference
    # :780-787)
    COLUMN_KEYWORDS = {
        "fixture_type": ("item", "fixture", "type", "description", "product", "component"),
        "quantity": ("qty", "quantity", "qty.", "count", "number", "pieces"),
        "model_number": ("model", "part #", "part number", "pn", "sku", "cat #", "catalog #", "item #"),
        "dimensions": ("size", "dimension", "dimensions", "length", "width", "height", "diameter"),
        "mounting_type": ("mounting", "mount", "installation", "location"),
        "spec_reference": ("spec", "specification", "standard", "grade", "class"),
    }

    def parse_tables(self, tables: List[List[List[Optional[str]]]], page_num: int) -> List[Item]:
        """Ragged tables → items (reference :760-829)."""
        items: List[Item] = []
        for t_idx, table in enumerate(tables):
            if not table or len(table) < 2:
                continue
            headers = [(c or "").strip().lower() for c in table[0]]
            header_map: Dict[int, str] = {}
            for col, header in enumerate(headers):
                for fld, keys in self.COLUMN_KEYWORDS.items():
                    if any(k in header for k in keys):
                        header_map[col] = fld
                        break
            for r_idx, row in enumerate(table[1:], start=1):
                item: Item = {
                    "page_number": page_num,
                    "table_number": t_idx + 1,
                    "row_number": r_idx,
                }
                for col, cell in enumerate(row):
                    fld = header_map.get(col)
                    if fld is None:
                        continue
                    val = (cell or "").strip()
                    if fld == "quantity" and val:
                        qm = re.search(r"\d+", val)
                        if qm:
                            item[fld] = int(qm.group())
                    else:
                        item[fld] = val or None
                if item.get("fixture_type") or item.get("quantity") or item.get("model_number"):
                    items.append(item)
                elif any(item.get(k) for k in ("dimensions", "mounting_type", "spec_reference")):
                    if row and row[0]:
                        item["fixture_type"] = str(row[0]).strip()
                        items.append(item)
        return items
