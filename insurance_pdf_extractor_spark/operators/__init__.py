"""Pipeline stage operators: sniff → tokenize → fields → finalize."""
