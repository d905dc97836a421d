select loan_id, {{ metrics_pkg.scaled_rate('interest_rate') }} as rate_pct
from {{ ref('raw_loans') }}
where loan_amount > {{ var('min_amount') }}
