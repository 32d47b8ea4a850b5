"""Standard-mode parsing: entity extraction, structured data, k/v pairs.

Re-expresses the reference's ``ParserRules`` semantics
(reference: extractor/parsers/standard.py:12-84) with the same six
entity regexes and ``findall`` ordering, structured for batch use:
patterns compile once per instance (actor/worker warm state) and the
batch stage calls ``extract_entities`` per row.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Pattern

# frozen order — output list columns follow this order
ENTITY_PATTERNS: tuple = (
    ("email", r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b"),
    ("phone", r"(\+?\d{1,3}[-.\s]?)?\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}"),
    ("date", r"\d{1,2}[/-]\d{1,2}[/-]\d{2,4}"),
    ("currency", r"\$[\d,]+\.?\d*"),
    ("url", r"https?://[^\s]+"),
    ("ssn", r"\d{3}-\d{2}-\d{4}"),
)


class EntityParser:
    """Six-regex entity extractor; ``findall`` per kind, keep non-empty."""

    def __init__(self, extra: Optional[Dict[str, Pattern]] = None) -> None:
        self.patterns: Dict[str, Pattern] = {
            name: re.compile(pat) for name, pat in ENTITY_PATTERNS
        }
        if extra:  # user-supplied pattern bank (reference :49-52)
            self.patterns.update(extra)

    def extract_entities(self, text: str) -> Dict[str, List[str]]:
        out: Dict[str, List[str]] = {}
        for kind, pattern in self.patterns.items():
            hits = pattern.findall(text)
            if hits:
                # findall with one group returns strings; with alternating
                # groups (phone) returns the group — reference behavior kept
                out[kind] = [h if isinstance(h, str) else h[0] for h in hits]
        return out

    def parse_structured_data(
        self, text: str, rules: Optional[Dict[str, Pattern]] = None
    ) -> Dict:
        patterns = {**self.patterns, **rules} if rules else self.patterns
        saved = self.patterns
        try:
            self.patterns = patterns
            result: Dict = dict(self.extract_entities(text))
        finally:
            self.patterns = saved
        result["raw_text"] = text
        result["word_count"] = len(text.split())
        result["line_count"] = len(text.split("\n"))
        return result

    @staticmethod
    def find_key_value_pairs(text: str, separator: str = ":") -> Dict[str, str]:
        pairs: Dict[str, str] = {}
        for line in text.split("\n"):
            if separator in line:
                key, _, value = line.partition(separator)
                key, value = key.strip(), value.strip()
                if key and value:
                    pairs[key] = value
        return pairs
