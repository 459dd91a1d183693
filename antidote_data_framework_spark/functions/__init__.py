from .money import sum_charged_price, sum_discounted_price  # noqa: F401
