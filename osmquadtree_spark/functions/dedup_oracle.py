"""DuckDB oracle SQL generators for the dedup operators.

The oracles restate each operator as its SEMANTIC SPEC over all pairs
(cross join a < b) instead of the Spark implementation's bucketed joins —
so an oracle match also validates that the LSH band join / pigeonhole block
join is COMPLETE for the claimed thresholds. Signature arithmetic (word
codes, gram folds, hash params) is embedded as the identical int64 literals
used by operators/dedup.py.
"""

from __future__ import annotations

from ..operators.dedup import HASH_PARAMS, KNUTH, N_BANDS, N_HASHES, P, SIM_BITS


def _word_code_sql(w: str) -> str:
    return (
        f"(length({w}) * 97 + ascii(substr({w}, 1, 1))"
        f" + ascii(substr({w}, length({w}), 1)) * 31)::BIGINT"
    )


def _gram_code_sql(n: int) -> str:
    """Code of the n-gram starting at 1-based word index i (DuckDB lambda
    over `i`, list named `words`) — same fold as dedup._gram_codes."""
    acc = _word_code_sql("words[i]")
    for j in range(1, n):
        acc = f"(({acc}) * 131 + {_word_code_sql(f'words[i+{j}]')}) % {P}"
    return acc


def _sig_cte(n: int) -> str:
    """CTE `sigs(doc_id, sig)`: the N_HASHES minhash signature list."""
    mins = ", ".join(
        f"list_min(list_transform(codes, c -> ({a} * c + {b}) % {P}))"
        for a, b in HASH_PARAMS
    )
    return f"""
      docs AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      codes AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(words) - {n - 2}, 1)),
                 i -> {_gram_code_sql(n)})) AS codes
        FROM docs WHERE len(words) >= {n}
      ),
      sigs AS (SELECT doc_id, [{mins}] AS sig FROM codes WHERE len(codes) > 0)
    """


def _band_key_sql(sig: str, band: int, rows: int) -> str:
    acc = f"({sig}[{band * rows + 1}] % {P})"
    for r in range(1, rows):
        acc = f"(({acc}) * 131 + {sig}[{band * rows + r + 1}]) % {P}"
    return acc


def minhash_pairs_sql(n: int = 3, min_matches: int = 8) -> str:
    """All-pairs restatement of minhash_lsh_pairs: pair qualifies iff some
    band bucket matches AND >= min_matches minhashes agree."""
    rows = N_HASHES // N_BANDS
    band_match = " OR ".join(
        f"({_band_key_sql('a.sig', b, rows)}) = ({_band_key_sql('b.sig', b, rows)})"
        for b in range(N_BANDS)
    )
    matches = (
        "list_reduce(list_prepend(0::BIGINT, list_transform(range(1, "
        f"{N_HASHES + 1}), i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1::BIGINT "
        "ELSE 0::BIGINT END)), (x, y) -> x + y)"
    )
    return f"""
        WITH {_sig_cte(n)}
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {matches} AS match_cnt
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        WHERE ({band_match}) AND {matches} >= {min_matches}
    """


def _simhash_sig_sql() -> str:
    """Expression for the 32-bit simhash over `words` (DuckDB list column)."""
    h = f"(({_word_code_sql('w')}) * {KNUTH}) % {1 << 32}"
    terms = []
    for j in range(SIM_BITS):
        ones = (
            f"list_reduce(list_prepend(0::BIGINT, list_transform(words, "
            f"w -> (({h}) >> {j}) & 1)), (x, y) -> x + y)"
        )
        terms.append(f"CASE WHEN 2 * ({ones}) >= len(words) THEN {1 << j}::BIGINT ELSE 0::BIGINT END")
    return "(" + " + ".join(terms) + ")"


def simhash_pairs_sql(max_hamming: int = 3) -> str:
    """All-pairs restatement of simhash_pairs: hamming(sig_a, sig_b) <=
    max_hamming. Matching the Spark block-join output also proves the
    pigeonhole join is complete for this threshold."""
    return f"""
        WITH docs AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        sigs AS (SELECT doc_id, {_simhash_sig_sql()} AS sig FROM docs)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
    """


def embedding_pairs_sql(min_cos: float) -> str:
    """Exact all-pairs cosine >= min_cos over the embeddings table — the
    same float op sequence as operators/dedup.embedding_dup_pairs."""
    dot = (
        "list_reduce(list_prepend(0.0::DOUBLE, list_transform("
        "list_zip(a.e, b.e), t -> t[1] * t[2])), (x, y) -> x + y)"
    )
    return f"""
        WITH {norm_cte()}
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {dot} / (a.nrm * b.nrm) AS cos
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE {dot} / (a.nrm * b.nrm) >= {min_cos!r}::DOUBLE
    """


def norm_cte() -> str:
    """Shared (vec_id, e, nrm) CTE body over the embeddings table."""
    return """
        v AS (
          SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings
        ), n AS (
          SELECT vec_id, e,
                 sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                    list_transform(e, x -> x * x)), (x, y) -> x + y)) AS nrm
          FROM v
        )"""


def embedding_lsh_soundness_sql(min_cos: float, candidates_path: str) -> str:
    """Soundness oracle for the LSH dedup path: the engine COMMITS its
    candidate pair set to parquet (operators/dedup.embedding_dup_pairs_lsh
    export_pairs_path) and this twin re-scores those candidates from the
    raw embeddings with the exact operator's float sequence — every pair
    the engine emits must carry the correct cosine and clear the threshold.
    Recall (which candidates LSH finds) is gated separately in pytest vs
    the exact operator; this gate proves the emitted VALUES."""
    dot = (
        "list_reduce(list_prepend(0.0::DOUBLE, list_transform("
        "list_zip(a.e, b.e), t -> t[1] * t[2])), (x, y) -> x + y)"
    )
    return f"""
        WITH cand AS (
          SELECT id_a, id_b FROM read_parquet('{candidates_path}/*.parquet')
        ), {norm_cte()}
        SELECT c.id_a, c.id_b, {dot} / (a.nrm * b.nrm) AS cos
        FROM cand c
        JOIN n a ON a.vec_id = c.id_a
        JOIN n b ON b.vec_id = c.id_b
        WHERE {dot} / (a.nrm * b.nrm) >= {min_cos!r}::DOUBLE
    """


def ann_lsh_soundness_sql(k: int, candidates_path: str) -> str:
    """Soundness oracle for LSH ANN: re-rank the engine's committed
    candidate set ((query_id, vec_id) parquet export) by exact cosine —
    the within-candidate-set top-k (ties broken by vec_id asc, the
    operator's rule) must match row for row."""
    dot = (
        "list_reduce(list_prepend(0.0::DOUBLE, list_transform("
        "list_zip(p.e, q.e), t -> t[1] * t[2])), (x, y) -> x + y)"
    )
    return f"""
        WITH cand AS (
          SELECT query_id, vec_id FROM read_parquet('{candidates_path}/*.parquet')
        ), {norm_cte()}
        SELECT query_id, vec_id, rank FROM (
          SELECT c.query_id, c.vec_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY c.query_id
                   ORDER BY {dot} / (p.nrm * q.nrm) DESC, c.vec_id ASC) AS rank
          FROM cand c
          JOIN n p ON p.vec_id = c.vec_id
          JOIN n q ON q.vec_id = c.query_id
        ) WHERE rank <= {k}
    """


def fingerprint_sql(text: str = "text") -> str:
    """DuckDB twin of docs.fingerprint's rolling hash over ``text``'s
    words — the ONE definition shared by the text_analysis and
    distinct_kmv oracles (word code via _word_code_sql, fold base 131
    mod P; P == docs.MOD)."""
    return (
        "list_reduce(list_prepend(0::BIGINT, list_transform("
        f"string_split({text}, ' '), w -> {_word_code_sql('w')})), "
        f"(a, b) -> (a * 131 + b) % {P})"
    )
