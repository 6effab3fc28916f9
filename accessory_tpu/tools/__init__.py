"""CLI tools: weight delta extract/apply, HF export, packed-data generation,
HF snapshot download. Reference: accessory/tools/."""
