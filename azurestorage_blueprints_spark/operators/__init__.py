"""Engine operators: file-pipeline verbs and LLM-data-pipeline transforms."""
