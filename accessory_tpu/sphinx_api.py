"""SPHINX user-facing package API.

Reference: SPHINX/sphinx.py:10-58 (``SPHINXModel.generate_response(qas,
image)``: conversation template, padded_resize to the model's image_size,
seeded sampling, stop at the response separator) and
SPHINX/batch_inference.py:56-160 (distributed batch captioning).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from accessory_tpu.data.conversation import default_conversation
from accessory_tpu.data.transform import padded_resize
from accessory_tpu.meta import MetaModel


class SPHINXModel(MetaModel):
    def generate_response(
        self,
        qas: List[List[Optional[str]]],
        image=None,
        max_gen_len: int = 512,
        temperature: float = 0.0,
        top_p: float = 0.95,
        seed: int = 0,
    ) -> str:
        """qas: [[q1, a1], ..., [qN, None]] — the last answer must be None;
        returns the model's answer to qN (reference SPHINX/sphinx.py:11-58)."""
        assert qas and qas[-1][1] is None, "last answer must be None"
        conv = default_conversation()
        conv.load_qas(qas)
        prompt = conv.get_prompt()

        images = None
        if image is not None:
            size = getattr(self.args, "image_size", 224)
            arr = padded_resize(image, size)
            images = np.asarray(arr)[None]

        out = self.generate(
            [prompt], images=images, max_gen_len=max_gen_len,
            temperature=temperature, top_p=top_p,
            additional_stop_symbols=(conv.response_end_signal,), seed=seed)[0]
        end = conv.response_end_signal
        if end and end in out:
            out = out[: out.index(end)]
        return out.strip()


def batch_caption(model: SPHINXModel, images, prompt: str = "Describe the image.",
                  batch_size: int = 8, **gen_kwargs) -> List[str]:
    """Batched captioning workload (reference SPHINX/batch_inference.py:56-160
    minus the NCCL plumbing — GSPMD shards the batch)."""
    conv = default_conversation()
    conv.load_qas([[prompt, None]])
    text = conv.get_prompt()
    outs: List[str] = []
    for i in range(0, len(images), batch_size):
        chunk = np.stack(images[i: i + batch_size])
        res = model.generate([text] * len(chunk), images=chunk,
                             additional_stop_symbols=(conv.response_end_signal,),
                             **gen_kwargs)
        outs.extend(r.split(conv.response_end_signal)[0].strip() for r in res)
    return outs
