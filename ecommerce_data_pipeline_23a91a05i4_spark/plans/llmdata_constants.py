"""Constants shared by the Spark gates (plans/llmdata.py) and their
DuckDB oracles (plans/oracles.py) — a separate module so neither
imports the other."""

# Top-K vocabulary cap for the t39 fluency gate, deliberately smaller
# than the testdata corpus's 31-token vocabulary so the driver gate
# exercises the capped path (the 100 TB shape: bounded unigram table,
# tail tokens lumped at the floor).
FLUENCY_VOCAB_CAP = 24
