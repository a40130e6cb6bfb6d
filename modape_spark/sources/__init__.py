from .sequences import sequences_df, sequences_local_pandas  # noqa: F401
