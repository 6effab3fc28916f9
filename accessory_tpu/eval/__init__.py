"""Evaluation harness.

Reference: light-eval/src/ (9 LM benchmark drivers: MMLU/CMMLU/C-Eval/BBH/
GSM8K/MATH/HumanEval/MM-Vet/LLaVA-bench, each building the model and running
batched generate, e.g. eval_mmlu.py:82-107) + the OpenCompass integration
exercising evaluate_examples (docs/evaluation.md:1-28).

This package provides the three evaluation primitives those drivers compose,
plus format-compatible CLI drivers:
  * perplexity       — sliding-window LM ppl (WikiText-2/C4 style; the
                       OmniQuant ≤0.1-Δppl accuracy gate from BASELINE)
  * multiple_choice  — loglikelihood-ranked A/B/C/D scoring (MMLU family)
  * generation_eval  — generate + answer-extraction accuracy (GSM8K family)
"""

from accessory_tpu.eval.harness import (  # noqa: F401
    generation_eval,
    multiple_choice,
    perplexity,
)
