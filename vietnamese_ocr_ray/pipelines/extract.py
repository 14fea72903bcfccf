def extract_spans(*a, **k): raise NotImplementedError
def run_extract(*a, **k): raise NotImplementedError
