{% macro scaled_rate(rate) %}(({{ rate }}) * {{ var('rate_scale') }}){% endmacro %}
