"""Host-side text tokenization for the conditional path (reference:
siglip2_utils.py:139-154: AutoTokenizer with padding='max_length', length 64
— "that's how the model was trained")."""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


class TextTokenizer:
    """Wraps a local HF tokenizer dir; returns numpy id/mask batches."""

    def __init__(self, model_name_or_path: str, max_length: int = 64):
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
        self.max_length = max_length

    def __call__(self, texts: List[str]) -> Dict[str, np.ndarray]:
        out = self.tokenizer(
            texts,
            padding="max_length",
            max_length=self.max_length,
            truncation=True,
            return_tensors="np",
            return_attention_mask=True,
        )
        return {
            "input_ids": np.asarray(out["input_ids"], np.int32),
            "attention_mask": np.asarray(out["attention_mask"], np.bool_),
        }
