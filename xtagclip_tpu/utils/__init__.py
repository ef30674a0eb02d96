

def as_variables(params_or_vars):
    """Accept either a bare params tree or a full variables dict."""
    if isinstance(params_or_vars, dict) and "params" in params_or_vars:
        return params_or_vars
    return {"params": params_or_vars}
