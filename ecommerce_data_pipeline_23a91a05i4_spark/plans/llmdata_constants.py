"""Constants shared by the Spark gates (plans/llmdata.py) and their
DuckDB oracles (plans/oracles.py) — a separate module so neither
imports the other."""

# Top-K vocabulary cap for the t39 fluency gate, deliberately smaller
# than the testdata corpus's 31-token vocabulary so the driver gate
# exercises the capped path (the 100 TB shape: bounded unigram table,
# tail tokens lumped at the floor).
FLUENCY_VOCAB_CAP = 24

# t84 bigram-LM fluency gate (operators/curation.bigram_fluency_stats):
# the bigram table cap is deliberately below the corpus's distinct
# bigram count so the gate exercises OOV backoff; the interpolation
# weights are integer percent (Jelinek-Mercer with exact arithmetic);
# the keep threshold sits near the sf-independent corpus median.
BIGRAM_VOCAB_CAP = 48
BIGRAM_LAMBDA_NUM = 70
BIGRAM_LAMBDA_DEN = 100
BIGRAM_FLUENCY_MEAN_MIN = 27900
