"""NL→IR compiler front ends.

``rules``  — deterministic keyword compiler (always available; the
             correctness-bearing path, mirroring ``No_Sql.py:316-377``).
``parse``  — LLM-response repair pipeline (``No_Sql.py:269-314``), pure and
             testable without any network.
``llm``    — optional LLM front end behind a config gate; same IR contract.
"""

from nlp_to_nosql_spark.compiler.rules import nl_to_queryspec, nl_to_ir

__all__ = ["nl_to_queryspec", "nl_to_ir"]
