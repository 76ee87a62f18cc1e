"""Sources: the pages input table and dictionary/rules dimension tables."""
